"""Tests for Gaussian W2 geometry and the barycentre kernels."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from bayesian_ensembling_tpu.ops import wasserstein as ws


def random_psd(rng, n, scale=1.0):
    a = rng.normal(size=(n, n))
    return scale * (a @ a.T + n * np.eye(n))


def test_sqrtm_psd(rng):
    a = random_psd(rng, 6)
    root = np.asarray(ws.sqrtm_psd(a))
    np.testing.assert_allclose(root @ root, a, rtol=1e-8, atol=1e-8)
    want = scipy.linalg.sqrtm(a).real
    np.testing.assert_allclose(root, want, rtol=1e-6, atol=1e-8)


def test_w2_zero_for_identical(rng):
    mu = rng.normal(size=4)
    cov = random_psd(rng, 4)
    d = float(ws.gaussian_w2_distance(mu, cov, mu, cov))
    assert abs(d) < 1e-6


def test_w2_squared_mean_gap_textbook(rng):
    # For equal covariances, W2^2 = |mu1 - mu2|^2.
    cov = random_psd(rng, 5)
    mu1 = rng.normal(size=5)
    mu2 = rng.normal(size=5)
    d = float(ws.gaussian_w2_distance(mu1, cov, mu2, cov, squared_mean_gap=True))
    np.testing.assert_allclose(d, np.sum((mu1 - mu2) ** 2), rtol=1e-6)


def test_w2_reference_compat_uses_unsquared_norm(rng):
    cov = random_psd(rng, 5)
    mu1 = rng.normal(size=5)
    mu2 = rng.normal(size=5)
    d = float(ws.gaussian_w2_distance(mu1, cov, mu2, cov))
    np.testing.assert_allclose(d, np.linalg.norm(mu1 - mu2), rtol=1e-6, atol=1e-8)


def test_w2_diag_matches_full(rng):
    mu1, mu2 = rng.normal(size=4), rng.normal(size=4)
    v1, v2 = rng.uniform(0.5, 2.0, 4), rng.uniform(0.5, 2.0, 4)
    d_diag = float(ws.gaussian_w2_distance_diag(mu1, v1, mu2, v2))
    d_full = float(ws.gaussian_w2_distance(mu1, np.diag(v1), mu2, np.diag(v2)))
    np.testing.assert_allclose(d_diag, d_full, rtol=1e-6)


def test_barycentre_identity():
    # Equal weights over identical Gaussians => that Gaussian back.
    means = jnp.array([1.5, 1.5, 1.5])
    stds = jnp.array([0.3, 0.3, 0.3])
    w = jnp.ones(3) / 3
    mu, sigma = ws.gaussian_barycentre_1d(means, stds, w)
    np.testing.assert_allclose(float(mu), 1.5, rtol=1e-7)
    np.testing.assert_allclose(float(sigma), 0.3, rtol=1e-7)


def test_barycentre_closed_form_is_weighted_sum(rng):
    means = rng.normal(size=5)
    stds = rng.uniform(0.1, 2.0, 5)
    w = rng.uniform(size=5)
    w = w / w.sum()
    mu, sigma = ws.gaussian_barycentre_1d(means, stds, w)
    np.testing.assert_allclose(float(mu), np.sum(w * means), rtol=1e-7)
    np.testing.assert_allclose(float(sigma), np.sum(w * stds), rtol=1e-7)


def oracle_fixed_point(means, std_devs, weights, tolerance=1e-6, init_var=1.0):
    """Plain-python re-statement of the reference iteration
    (wasserstein.py:80-99), including the signed convergence test."""
    v = init_var
    n = 0
    while True:
        candidate = float(np.sqrt(v) * np.sum(weights * std_devs))
        if candidate - v < tolerance:
            v = candidate
            break
        v = candidate
        n += 1
        if n > 200:
            break
    return float(np.sum(weights * means)), float(np.sqrt(v))


def test_fixed_point_matches_reference_semantics_large_sigma(rng):
    # sum w*s > 1 so the iteration actually runs to convergence.
    means = rng.normal(size=4)
    stds = rng.uniform(1.0, 3.0, 4)
    w = rng.uniform(size=4)
    w = w / w.sum()
    mu, sigma = ws.gaussian_barycentre_1d_fixed_point(
        jnp.asarray(means), jnp.asarray(stds), jnp.asarray(w)
    )
    mu0, sigma0 = oracle_fixed_point(means, stds, w)
    np.testing.assert_allclose(float(mu), mu0, rtol=1e-6)
    np.testing.assert_allclose(float(sigma), sigma0, rtol=1e-4)
    # And it should approach the true fixed point (sum w s)^2.
    np.testing.assert_allclose(float(sigma), np.sum(w * stds), rtol=1e-3)


def test_fixed_point_matches_reference_semantics_small_sigma(rng):
    # sum w*s < 1: the reference's signed test exits after ONE iteration with
    # variance = sum(w*s)  (a known quirk; documented in ops.wasserstein).
    means = rng.normal(size=3)
    stds = rng.uniform(0.05, 0.3, 3)
    w = np.ones(3) / 3
    mu, sigma = ws.gaussian_barycentre_1d_fixed_point(
        jnp.asarray(means), jnp.asarray(stds), jnp.asarray(w)
    )
    mu0, sigma0 = oracle_fixed_point(means, stds, w)
    np.testing.assert_allclose(float(mu), mu0, rtol=1e-6)
    np.testing.assert_allclose(float(sigma), sigma0, rtol=1e-6)
    np.testing.assert_allclose(float(sigma), np.sqrt(np.sum(w * stds)), rtol=1e-6)


def test_batched_barycentre(rng):
    m, n = 6, 40
    means = rng.normal(size=(m, n))
    stds = rng.uniform(0.1, 2.0, (m, n))
    w = rng.uniform(size=(m, n))
    w = w / w.sum(axis=0, keepdims=True)
    mu, sigma = ws.batched_gaussian_barycentre(
        jnp.asarray(means), jnp.asarray(stds), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(mu), np.sum(w * means, 0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma), np.sum(w * stds, 0), rtol=1e-6)


def test_batched_barycentre_mask(rng):
    m, n = 4, 10
    means = rng.normal(size=(m, n))
    stds = rng.uniform(0.1, 2.0, (m, n))
    w = np.ones((m, n))
    mask = np.ones((m, n))
    mask[-1] = 0.0
    w = w * mask
    w = w / w.sum(axis=0, keepdims=True)
    mu, _ = ws.batched_gaussian_barycentre(
        jnp.asarray(means), jnp.asarray(stds), jnp.asarray(w), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(mu), np.mean(means[:-1], 0), rtol=1e-6)


def test_bures_covariance_distance(rng):
    a = random_psd(rng, 5)
    d0 = float(ws.bures_covariance_distance(a, a))
    assert abs(d0) < 1e-6
    b = random_psd(rng, 5)
    d = float(ws.bures_covariance_distance(a, b))
    # Equals the covariance term of the W2 with equal means.
    w2 = float(ws.gaussian_w2_distance(np.zeros(5), a, np.zeros(5), b))
    np.testing.assert_allclose(d, w2, rtol=1e-6, atol=1e-8)


def test_mixture_sigma_matches_numpy(rng):
    """sigma_mode='mixture' equals the hand-computed mixture moments and
    dominates the W2 sigma (Cauchy-Schwarz: sum w s^2 >= (sum w s)^2 plus
    the nonnegative spread term)."""
    from bayesian_ensembling_tpu.ops.wasserstein import batched_gaussian_barycentre

    m, n = 5, 11
    means = rng.normal(size=(m, n))
    stds = np.abs(rng.normal(size=(m, n))) + 0.1
    w = rng.uniform(0.1, 1.0, size=(m, n))
    w = w / w.sum(axis=0, keepdims=True)

    mu, sigma = batched_gaussian_barycentre(
        jnp.asarray(means), jnp.asarray(stds), jnp.asarray(w), sigma_mode="mixture"
    )
    mu_np = (w * means).sum(axis=0)
    var_np = (w * (stds**2 + (means - mu_np[None, :]) ** 2)).sum(axis=0)
    np.testing.assert_allclose(np.asarray(mu), mu_np, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma), np.sqrt(var_np), rtol=1e-6)

    _, sigma_w2 = batched_gaussian_barycentre(
        jnp.asarray(means), jnp.asarray(stds), jnp.asarray(w)
    )
    assert np.all(np.asarray(sigma) >= np.asarray(sigma_w2) - 1e-12)


def test_mixture_sigma_identity_for_identical_members():
    """Equal weights + identical Gaussians: every mode returns the member."""
    from bayesian_ensembling_tpu.ops.wasserstein import batched_gaussian_barycentre

    m, n = 4, 7
    means = jnp.ones((m, n)) * 1.5
    stds = jnp.ones((m, n)) * 0.3
    w = jnp.full((m, n), 1.0 / m)
    for mode in ("w2", "mixture"):
        mu, sigma = batched_gaussian_barycentre(means, stds, w, sigma_mode=mode)
        np.testing.assert_allclose(np.asarray(mu), 1.5, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sigma), 0.3, rtol=1e-6)


def test_unknown_sigma_mode_raises():
    from bayesian_ensembling_tpu.ops.wasserstein import batched_gaussian_barycentre

    with pytest.raises(ValueError, match="sigma_mode"):
        batched_gaussian_barycentre(
            jnp.ones((2, 3)), jnp.ones((2, 3)), jnp.ones((2, 3)), sigma_mode="nope"
        )
