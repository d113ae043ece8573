"""Validation metrics: NLL, RMSE, Gaussian W2 between posteriors.

The scoring trio of the reference's perfect-model tests
(``/root/reference/ensembles/utils.py:139-155``), as pure functions.

Note a deliberate fix: the reference materialises its barycentre through
``dx.MultivariateNormalDiag(mu, sigma**2)`` — passing the *variance* where
distrax expects the scale diagonal — so its NLL is evaluated under an
effective stddev of sigma^2.  Here NLL uses the correct stddev.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np

from bayesian_ensembling_tpu.data import Posterior
from bayesian_ensembling_tpu.ops.distributions import FullCovGaussian
from bayesian_ensembling_tpu.ops.scoring import diag_log_likelihood, mean_gaussian_crps
from bayesian_ensembling_tpu.ops.wasserstein import (
    gaussian_w2_distance,
    gaussian_w2_distance_diag,
)

__all__ = ["nll", "rmse", "w2_between_posteriors", "crps"]


def nll(post: Posterior, obs_values: np.ndarray) -> float:
    """Mean negative log-likelihood of observations under the posterior
    marginals (utils.py:139: -mean(log_prob))."""
    flat = jnp.asarray(obs_values.reshape(obs_values.shape[0], -1))
    mean = jnp.asarray(post.gaussian.mean)
    var = jnp.asarray(post.gaussian.variance)
    ll = diag_log_likelihood(mean, var, flat)
    return float(-jnp.mean(ll))


def rmse(post: Posterior, obs_values: np.ndarray) -> float:
    """Across-realisation RMSE of the posterior mean, time-averaged
    (utils.py:141)."""
    flat = obs_values.reshape(obs_values.shape[0], -1)
    mean = np.asarray(post.gaussian.mean)
    return float(np.mean(np.sqrt(np.mean((mean - flat) ** 2, axis=0))))


def crps(post: Posterior, obs_values: np.ndarray) -> float:
    """Mean continuous ranked probability score of the posterior marginals
    against observation realisations (closed-form Gaussian CRPS,
    ops/scoring.py).

    An addition over the reference's NLL/RMSE/W2 trio (utils.py:139-155):
    CRPS is a strictly proper scoring rule for the full predictive
    distribution against held-out *trajectories*, so it adjudicates the
    calibration question (sharp-but-overconfident vs wide-but-calibrated)
    that NLL raises and W2-to-the-pseudo-posterior cannot answer.
    """
    flat = jnp.asarray(obs_values.reshape(obs_values.shape[0], -1))
    mean = jnp.asarray(post.gaussian.mean)
    sigma = jnp.sqrt(jnp.asarray(post.gaussian.variance))
    return float(jnp.mean(mean_gaussian_crps(mean, sigma, flat)))


def w2_between_posteriors(a: Posterior, b: Posterior) -> float:
    """Gaussian W2 between two posteriors (utils.py:143-146): full-covariance
    when both carry one, else the diagonal form."""
    ga, gb = a.gaussian, b.gaussian
    a_full = isinstance(ga, FullCovGaussian)
    b_full = isinstance(gb, FullCovGaussian)
    if a_full or b_full:
        cov_a = ga.cov if a_full else jnp.diag(jnp.asarray(ga.variance))
        cov_b = gb.cov if b_full else jnp.diag(jnp.asarray(gb.variance))
        return float(gaussian_w2_distance(ga.mean, cov_a, gb.mean, cov_b))
    return float(
        gaussian_w2_distance_diag(ga.mean, ga.variance, gb.mean, gb.variance)
    )
