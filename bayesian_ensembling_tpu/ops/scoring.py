"""Vectorised probabilistic scoring kernels: log-likelihood, CRPS, KSD.

These are the compute cores behind the weighting layer
(``/root/reference/ensembles/weights.py``).  The reference evaluates every
score with Python double loops over models x marginals (weights.py:88-104,
416-421, 483-495); here each score is a single vmapped JAX expression over
``(n_models, n_points)`` so the whole weighting stage is one fused XLA
program, and the model axis can be sharded with a ``psum`` for the final
normalisation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "diag_log_likelihood",
    "fullcov_constant_vector_log_likelihood",
    "gaussian_crps",
    "mean_gaussian_crps",
    "imq_ksd_1d",
    "batched_imq_ksd",
]

_LOG_2PI = 1.8378770664093453
_INV_SQRT_PI = 0.5641895835477563  # 1/sqrt(pi)
_INV_SQRT_2PI = 0.3989422804014327  # 1/sqrt(2*pi)
_INV_SQRT_2 = 0.7071067811865476  # 1/sqrt(2)


def diag_log_likelihood(mean: jnp.ndarray, var: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    """Per-point Gaussian log-density of observations.

    Args:
      mean, var: posterior marginals, shape ``(n_points,)``.
      obs: observations, shape ``(n_obs_real, n_points)``.

    Returns:
      ``(n_obs_real, n_points)`` log-densities — the diag branch of the
      reference's LogLikelihoodWeight (weights.py:95-96).
    """
    z2 = jnp.square(obs - mean) / var
    return -0.5 * (z2 + jnp.log(var) + _LOG_2PI)


def fullcov_constant_vector_log_likelihood(
    mean: jnp.ndarray, chol: jnp.ndarray, obs: jnp.ndarray
) -> jnp.ndarray:
    """Reference-semantics MVN log-likelihood for full-covariance posteriors.

    The reference feeds ``obs[:, None]`` (shape ``(T, 1)``) into an MVN over
    T dims (weights.py:98-100); distrax broadcasting turns row ``t`` into the
    *constant vector* ``obs_t * ones(T)``, so the per-time score is
    ``log N(obs_t * 1; mu, Sigma)``.  With ``a = L^-1 1`` and ``b = L^-1 mu``
    this is evaluated for all t in O(T^2) instead of T solves of O(T^2):

      ll_t = -0.5 * (|obs_t a - b|^2 + logdet Sigma + T log 2pi).

    Args:
      mean: ``(T,)`` posterior mean.
      chol: ``(T, T)`` lower Cholesky factor of the posterior covariance.
      obs: ``(n_obs_real, T)`` observations.

    Returns:
      ``(n_obs_real, T)`` log-densities.
    """
    t = mean.shape[-1]
    ones = jnp.ones((t,), dtype=mean.dtype)
    a = jax.scipy.linalg.solve_triangular(chol, ones, lower=True)
    b = jax.scipy.linalg.solve_triangular(chol, mean, lower=True)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    # |obs_t * a - b|^2 = obs_t^2 |a|^2 - 2 obs_t a.b + |b|^2
    aa = jnp.dot(a, a)
    ab = jnp.dot(a, b)
    bb = jnp.dot(b, b)
    quad = jnp.square(obs) * aa - 2.0 * obs * ab + bb
    return -0.5 * (quad + logdet + t * _LOG_2PI)


def gaussian_crps(obs: jnp.ndarray, mu: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Closed-form CRPS of a Gaussian forecast, elementwise.

    Replaces ``properscoring.crps_gaussian`` (weights.py:469-471):
    ``CRPS = sigma * (z (2 Phi(z) - 1) + 2 phi(z) - 1/sqrt(pi))`` with
    ``z = (obs - mu)/sigma``.
    """
    z = (obs - mu) / sigma
    cdf = 0.5 * (1.0 + jax.lax.erf(z * _INV_SQRT_2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * jnp.square(z))
    return sigma * (z * (2.0 * cdf - 1.0) + 2.0 * pdf - _INV_SQRT_PI)


def mean_gaussian_crps(mean: jnp.ndarray, sigma: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    """CRPS averaged over observation realisations.

    Args:
      mean, sigma: ``(n_points,)`` posterior marginal mean / stddev.
      obs: ``(n_obs_real, n_points)``.

    Returns:
      ``(n_points,)`` mean CRPS — one fused expression replacing the
      reference's per-marginal Python loop (weights.py:483-495).
    """
    return jnp.mean(gaussian_crps(obs, mean, sigma), axis=0)


def imq_k0_matrix(
    samples: jnp.ndarray, grads: jnp.ndarray, c: float = 1.0, beta: float = -0.5
) -> jnp.ndarray:
    """The ``(n, n)`` IMQ Stein kernel matrix (reference ``k_0_fun``,
    weights.py:360-376, dim = 1):

      k0(x, y) = g_x g_y K + 2 beta (g_y - g_x) d K' - 2 beta K'
                 - 4 beta (beta-1) d^2 K''
    with d = x - y, K = (c^2 + d^2)^beta.  Shared by the dense KSD
    (``imq_ksd_1d``) and the masked variant in validation.batched_pmt.
    """
    d = samples[:, None] - samples[None, :]
    imq = c**2 + jnp.square(d)
    gg = grads[:, None] * grads[None, :]
    term1 = gg * imq**beta
    term2 = -2.0 * beta * grads[:, None] * d * imq ** (beta - 1.0)
    term3 = 2.0 * beta * grads[None, :] * d * imq ** (beta - 1.0)
    term4 = -2.0 * beta * imq ** (beta - 1.0)  # dim = 1
    term5 = -4.0 * beta * (beta - 1.0) * imq ** (beta - 2.0) * jnp.square(d)
    return term1 + term2 + term3 + term4 + term5


def imq_ksd_1d(samples: jnp.ndarray, grads: jnp.ndarray, c: float = 1.0, beta: float = -0.5) -> jnp.ndarray:
    """Kernel Stein Discrepancy with an IMQ Stein kernel, 1-D marginals.

    Vectorised form of the reference's ``k_0_fun`` + scan accumulation
    (weights.py:360-393) for scalar samples (dim = 1).

    Args:
      samples: ``(n,)`` observation samples for one marginal.
      grads: ``(n,)`` score function values d/dx log p(x) at the samples.

    Returns:
      scalar ``sqrt(sum_jk k0) / n`` (matching weights.py:393).
    """
    total = jnp.sum(imq_k0_matrix(samples, grads, c=c, beta=beta))
    n = samples.shape[0]
    return jnp.sqrt(total) / n


def batched_imq_ksd(
    mean: jnp.ndarray,
    scale: jnp.ndarray,
    obs: jnp.ndarray,
    c: float = 1.0,
    beta: float = -0.5,
) -> jnp.ndarray:
    """KSD of Gaussian marginals against observation samples, all points at once.

    The reference builds ``dx.Normal(model_mean[i], model_var[i])`` per
    marginal — note it passes the *variance* where distrax expects a scale
    (weights.py:417, a quirk we preserve by letting the caller choose
    ``scale``) — and uses the score ``d/dx log N(x; mu, scale)``
    = ``-(x - mu)/scale^2``.

    Args:
      mean, scale: ``(n_points,)`` marginal location and scale parameters.
      obs: ``(n_obs_real, n_points)`` observation samples.

    Returns:
      ``(n_points,)`` KSD values.
    """

    def one_point(m, s, x):
        grads = -(x - m) / jnp.square(s)
        return imq_ksd_1d(x, grads, c=c, beta=beta)

    return jax.vmap(one_point, in_axes=(0, 0, 1))(mean, scale, obs)
