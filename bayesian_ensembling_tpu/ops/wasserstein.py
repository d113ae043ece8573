"""Gaussian Wasserstein-2 geometry: matrix sqrt, W2 distance, barycentres.

TPU-native re-design of ``/root/reference/ensembles/wasserstein.py``:

  * ``sqrtm`` (reference: SVD, wasserstein.py:10) is implemented with a
    symmetric eigendecomposition and clamped eigenvalues — stabler on
    near-singular covariances and cheaper than SVD on TPU.
  * ``gaussian_w2_distance`` (reference: wasserstein.py:21-47) supports both
    the textbook W2² (``squared_mean_gap=True``) and the reference's quirk of
    using the *un-squared* mean gap (wasserstein.py:40,45), which is the
    behaviour its ModelSimilarityWeight depends on.
  * ``gaussian_barycentre_1d`` (reference: wasserstein.py:61-100) — the
    reference iterates ``v <- sqrt(v) * sum_i w_i s_i`` with a *signed*
    convergence test.  The true fixed point is ``sigma = sum_i w_i s_i``
    (the closed form, our default).  A faithful fixed-point variant with the
    reference's signed test and 200-iteration cap is provided for parity
    checks; it is a ``lax.while_loop`` so it vmaps/shards cleanly instead of
    the reference's per-point Python loop (ensemble_scheme.py:54).

All functions are shape-polymorphic pure JAX: wrap in ``jax.vmap`` to batch
over grid cells / time points and ``jax.jit`` at the call site.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp

__all__ = [
    "sqrtm_psd",
    "bures_covariance_distance",
    "gaussian_w2_distance",
    "gaussian_w2_distance_diag",
    "gaussian_barycentre_1d",
    "gaussian_barycentre_1d_fixed_point",
    "batched_gaussian_barycentre",
]


def sqrtm_psd(a: jnp.ndarray) -> jnp.ndarray:
    """Matrix square root of a symmetric PSD matrix via eigh.

    Eigenvalues are clamped at zero so that numerically-negative eigenvalues
    of a near-singular covariance cannot produce NaNs (the reference's
    SVD-based ``sqrtm`` at wasserstein.py:10-13 silently relies on SVD of a
    symmetric matrix; eigh is the idiomatic / differentiable-friendly choice).
    """
    w, v = jnp.linalg.eigh(a)
    w = jnp.clip(w, 0.0, None)
    return (v * jnp.sqrt(w)[..., None, :]) @ jnp.swapaxes(v, -1, -2)


def bures_covariance_distance(cov_a: jnp.ndarray, cov_b: jnp.ndarray) -> jnp.ndarray:
    """Bures metric between covariance matrices, means ignored
    (the reference's ``wasserstien_distance`` [sic], wasserstein.py:15-19):
    ``tr(A) + tr(B) - 2 tr((A^1/2 B A^1/2)^1/2)``."""
    root_a = sqrtm_psd(cov_a)
    cross = sqrtm_psd(root_a @ cov_b @ root_a)
    return jnp.trace(cov_a) + jnp.trace(cov_b) - 2.0 * jnp.trace(cross)


def gaussian_w2_distance(
    mu1: jnp.ndarray,
    cov1: jnp.ndarray,
    mu2: jnp.ndarray,
    cov2: jnp.ndarray,
    *,
    squared_mean_gap: bool = False,
) -> jnp.ndarray:
    """W2 "distance" between full-covariance Gaussians.

    With ``squared_mean_gap=True`` this is the textbook squared Wasserstein-2
    distance ``|mu1-mu2|^2 + tr(cov1 + cov2 - 2 (cov1^1/2 cov2 cov1^1/2)^1/2)``.
    The default (``False``) reproduces the reference, which uses the plain
    L2 norm of the mean gap (wasserstein.py:40,45).
    """
    gap = jnp.linalg.norm(mu1 - mu2)
    location_gap = jnp.square(gap) if squared_mean_gap else gap
    c1_sqrt = sqrtm_psd(cov1)
    cross = sqrtm_psd(c1_sqrt @ cov2 @ c1_sqrt)
    covariance_gap = jnp.trace(cov1) + jnp.trace(cov2) - 2.0 * jnp.trace(cross)
    return location_gap + covariance_gap


def gaussian_w2_distance_diag(
    mu1: jnp.ndarray,
    var1: jnp.ndarray,
    mu2: jnp.ndarray,
    var2: jnp.ndarray,
    *,
    squared_mean_gap: bool = False,
) -> jnp.ndarray:
    """W2 distance between diagonal Gaussians (no matrix sqrt needed).

    Equivalent to the reference's ``full_cov=False`` branch
    (wasserstein.py:36-39), which embeds marginal variances into a diagonal
    covariance; for diagonal matrices the Bures term collapses to
    ``sum (sqrt(var1) - sqrt(var2))^2``.
    """
    gap = jnp.linalg.norm(mu1 - mu2)
    location_gap = jnp.square(gap) if squared_mean_gap else gap
    s1 = jnp.sqrt(jnp.clip(var1, 0.0, None))
    s2 = jnp.sqrt(jnp.clip(var2, 0.0, None))
    covariance_gap = jnp.sum(jnp.square(s1 - s2))
    return location_gap + covariance_gap


def gaussian_barycentre_1d(
    means: jnp.ndarray,
    std_devs: jnp.ndarray,
    weights: jnp.ndarray,
    mask: tp.Optional[jnp.ndarray] = None,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form W2 barycentre of 1-D Gaussians.

    For weights summing to one, the W2 barycentre of ``N(m_i, s_i^2)`` is
    ``N(sum w_i m_i, (sum w_i s_i)^2)`` — the exact fixed point of the
    reference's iteration (wasserstein.py:82-97).  ``mask`` zeroes out padded
    ensemble members (ragged model counts).
    """
    if mask is not None:
        weights = weights * mask
    mu = jnp.sum(weights * means)
    sigma = jnp.sum(weights * std_devs)
    return mu, sigma


def gaussian_barycentre_1d_fixed_point(
    means: jnp.ndarray,
    std_devs: jnp.ndarray,
    weights: jnp.ndarray,
    tolerance: float = 1e-6,
    init_var: float = 1.0,
    max_iters: int = 200,
    return_iters: bool = False,
):
    """Reference-faithful fixed-point barycentre (parity/compat path).

    Replicates wasserstein.py:61-100 exactly, including the *signed*
    convergence test ``candidate - current < tol`` (so an iteration that
    decreases the variance terminates immediately) and the 200-iteration cap.
    Implemented as a ``lax.while_loop`` so it can be vmapped over every
    (time, cell) point instead of the reference's scalar Python loop.
    """
    weighted_std_sum = jnp.sum(weights * std_devs)

    def cond(state):
        var, n_iters, done = state
        return jnp.logical_and(~done, n_iters <= max_iters)

    def body(state):
        var, n_iters, _ = state
        candidate = jnp.sqrt(var) * weighted_std_sum
        done = (candidate - var) < tolerance
        return candidate, n_iters + 1, done

    init = (jnp.asarray(init_var, dtype=means.dtype), jnp.asarray(0), jnp.asarray(False))
    var, n_iters, _ = jax.lax.while_loop(cond, body, init)
    mu = jnp.sum(weights * means)
    if return_iters:
        return mu, jnp.sqrt(var), n_iters
    return mu, jnp.sqrt(var)


#: Valid ``sigma_mode`` values for the pointwise Gaussian combination.
SIGMA_MODES = ("w2", "compat", "mixture")


@functools.partial(jax.jit, static_argnames=("compat_fixed_point", "sigma_mode"))
def batched_gaussian_barycentre(
    means: jnp.ndarray,
    std_devs: jnp.ndarray,
    weights: jnp.ndarray,
    mask: tp.Optional[jnp.ndarray] = None,
    *,
    compat_fixed_point: bool = False,
    sigma_mode: str = "w2",
) -> tp.Tuple[jnp.ndarray, ...]:
    """Barycentre over the model axis for every point at once.

    Args:
      means / std_devs / weights: arrays of shape ``(n_models, n_points)``.
      mask: optional ``(n_models, n_points)`` validity mask for padded models.
      compat_fixed_point: deprecated alias for ``sigma_mode="compat"``.
      sigma_mode: how the combined sigma is formed (the mean is
        ``sum w_i mu_i`` in every mode):
          * ``"w2"`` — closed-form W2 barycentre ``sigma = sum w_i sigma_i``
            (the exact fixed point of the reference's iteration).  Matches
            the pseudo-truth *distribution* best (wins W2 35/35 in the PMT
            campaign, BASELINE.md) but its tight intervals are overconfident
            against held-out trajectories (NLL 0/35).
          * ``"compat"`` — the reference-faithful fixed-point iteration
            including its signed convergence test, which exits after one
            step whenever ``sum w_i sigma_i < 1`` and returns
            ``sqrt(sum w_i sigma_i)`` — inflating sigma on anomaly-scale
            data (reference wasserstein.py:82-97).
          * ``"mixture"`` — moment-matched Gaussian mixture:
            ``sigma^2 = sum w_i (sigma_i^2 + (mu_i - mu)^2)``.  The exact
            variance of the weighted mixture of the member posteriors; adds
            the inter-model spread term the W2 barycentre drops, so it is
            the *principled* calibrated option (VERDICT r2 item 2).

    Returns:
      ``(mu, sigma)`` arrays of shape ``(n_points,)`` — or, in compat mode,
      ``(mu, sigma, n_iters)`` where the extra ``(n_points,)`` int array
      reports each point's fixed-point iteration count (callers use it for
      the non-convergence warning).  This one vmapped call replaces the
      reference's serial loop over points (ensemble_scheme.py:53-69, the
      ``TODO want to parallelise this!``).
    """
    if compat_fixed_point:
        sigma_mode = "compat"
    if sigma_mode not in SIGMA_MODES:
        raise ValueError(f"sigma_mode {sigma_mode!r} not in {SIGMA_MODES}")
    if mask is not None:
        weights = weights * mask
    if sigma_mode == "compat":
        fn = jax.vmap(
            functools.partial(gaussian_barycentre_1d_fixed_point, return_iters=True),
            in_axes=(1, 1, 1),
        )
        mu, sigma, n_iters = fn(means, std_devs, weights)
        return mu, sigma, n_iters
    mu = jnp.sum(weights * means, axis=0)
    if sigma_mode == "mixture":
        var = jnp.sum(
            weights * (jnp.square(std_devs) + jnp.square(means - mu[None, :])),
            axis=0,
        )
        return mu, jnp.sqrt(var)
    sigma = jnp.sum(weights * std_devs, axis=0)
    return mu, sigma
