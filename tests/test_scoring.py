"""Tests for scoring kernels: log-likelihood, CRPS, KSD."""

import numpy as np
import jax.numpy as jnp
import scipy.stats

from bayesian_ensembling_tpu.ops import scoring


def test_diag_log_likelihood_matches_scipy(rng):
    mean = rng.normal(size=7)
    var = rng.uniform(0.2, 2.0, 7)
    obs = rng.normal(size=(3, 7))
    got = np.asarray(scoring.diag_log_likelihood(mean, var, obs))
    want = scipy.stats.norm.logpdf(obs, loc=mean, scale=np.sqrt(var))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_fullcov_constant_vector_ll(rng):
    t = 6
    mean = rng.normal(size=t)
    a = rng.normal(size=(t, t))
    cov = a @ a.T + t * np.eye(t)
    chol = np.linalg.cholesky(cov)
    obs = rng.normal(size=(2, t))
    got = np.asarray(
        scoring.fullcov_constant_vector_log_likelihood(mean, chol, obs)
    )
    # Oracle: log N(obs_t * ones(T); mean, cov) for every t — the distrax
    # broadcast the reference relies on (weights.py:98-100).
    mvn = scipy.stats.multivariate_normal(mean=mean, cov=cov)
    want = np.empty_like(got)
    for r in range(obs.shape[0]):
        for t_idx in range(t):
            want[r, t_idx] = mvn.logpdf(np.full(t, obs[r, t_idx]))
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_gaussian_crps_closed_form(rng):
    # Oracle: numerical integral of (F(x) - 1{x >= obs})^2 dx, split at the
    # Heaviside jump so quadrature sees smooth integrands.
    import scipy.integrate

    mu, sigma, obs = 0.3, 1.2, -0.4
    lo, hi = mu - 14 * sigma, mu + 14 * sigma
    below, _ = scipy.integrate.quad(
        lambda x: scipy.stats.norm.cdf(x, mu, sigma) ** 2, lo, obs
    )
    above, _ = scipy.integrate.quad(
        lambda x: (scipy.stats.norm.cdf(x, mu, sigma) - 1.0) ** 2, obs, hi
    )
    want = below + above
    got = float(scoring.gaussian_crps(jnp.asarray(obs), mu, sigma))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_mean_gaussian_crps_shape(rng):
    mean = rng.normal(size=5)
    sigma = rng.uniform(0.5, 1.5, 5)
    obs = rng.normal(size=(9, 5))
    out = np.asarray(scoring.mean_gaussian_crps(mean, sigma, obs))
    assert out.shape == (5,)
    assert (out > 0).all()


def oracle_ksd(samples, grads, c=1.0, beta=-0.5):
    """Independent numpy double-loop IMQ KSD oracle (dim=1 scalars)."""
    n = len(samples)
    total = 0.0
    for a in range(n):
        for b in range(n):
            d = samples[a] - samples[b]
            imq = c**2 + d * d
            t1 = grads[a] * grads[b] * imq**beta
            t2 = -2 * beta * grads[a] * d * imq ** (beta - 1)
            t3 = 2 * beta * grads[b] * d * imq ** (beta - 1)
            t4 = -2 * 1 * beta * imq ** (beta - 1)
            t5 = -4 * beta * (beta - 1) * imq ** (beta - 2) * d * d
            total += t1 + t2 + t3 + t4 + t5
    return np.sqrt(total) / n


def test_imq_ksd_matches_oracle(rng):
    samples = rng.normal(size=11)
    grads = -(samples - 0.5) / 1.3**2
    got = float(scoring.imq_ksd_1d(jnp.asarray(samples), jnp.asarray(grads)))
    want = oracle_ksd(samples, grads)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_batched_ksd(rng):
    mean = rng.normal(size=4)
    scale = rng.uniform(0.5, 1.5, 4)
    obs = rng.normal(size=(13, 4))
    got = np.asarray(scoring.batched_imq_ksd(mean, scale, obs))
    for i in range(4):
        grads = -(obs[:, i] - mean[i]) / scale[i] ** 2
        want = oracle_ksd(obs[:, i], grads)
        np.testing.assert_allclose(got[i], want, rtol=1e-7)


def test_ksd_smaller_for_true_model(rng):
    # Samples drawn from N(0,1): KSD against N(0,1) should beat N(3,1).
    obs = rng.normal(size=(200, 1))
    good = float(scoring.batched_imq_ksd(jnp.zeros(1), jnp.ones(1), obs)[0])
    bad = float(scoring.batched_imq_ksd(3 * jnp.ones(1), jnp.ones(1), obs)[0])
    assert good < bad
