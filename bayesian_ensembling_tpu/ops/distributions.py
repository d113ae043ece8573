"""Gaussian distribution pytrees.

Replaces the reference's use of ``distrax`` (``/root/reference/ensembles/
data.py:18-143`` wraps ``dx.Normal`` / ``dx.MultivariateNormalFullCovariance``
/ ``dx.MultivariateNormalDiag``).  Plain pytree dataclasses keep the moments
as device arrays so that every consumer (weights, barycentres, metrics) is a
jit/vmap-friendly pure function, and the containers can cross ``pjit``
boundaries and be checkpointed as raw arrays.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["DiagGaussian", "FullCovGaussian", "GaussianMoments"]

_LOG_2PI = 1.8378770664093453  # log(2*pi)


@struct.dataclass
class DiagGaussian:
    """Independent Gaussians over N points: ``N(mean_i, var_i)`` per point.

    Mirrors ``dx.Normal``/``dx.MultivariateNormalDiag`` usage in the
    reference (models.py:129-132, ensemble_scheme.py:75-78).
    """

    mean: jnp.ndarray  # (..., N)
    var: jnp.ndarray  # (..., N)

    @property
    def variance(self) -> jnp.ndarray:
        return self.var

    @property
    def stddev(self) -> jnp.ndarray:
        return jnp.sqrt(self.var)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """Elementwise Gaussian log-density, shape = broadcast(x, mean)."""
        z2 = jnp.square(x - self.mean) / self.var
        return -0.5 * (z2 + jnp.log(self.var) + _LOG_2PI)

    def sample(self, key: jax.Array, sample_shape: tp.Tuple[int, ...] = ()) -> jnp.ndarray:
        shape = sample_shape + self.mean.shape
        eps = jax.random.normal(key, shape, dtype=self.mean.dtype)
        return self.mean + eps * jnp.sqrt(self.var)


@struct.dataclass
class FullCovGaussian:
    """A single N-dimensional Gaussian with full covariance.

    Mirrors ``dx.MultivariateNormalFullCovariance`` (models.py:224-229).  The
    Cholesky factor is computed lazily and jittered for PSD safety.
    """

    mean: jnp.ndarray  # (N,)
    cov: jnp.ndarray  # (N, N)

    @property
    def variance(self) -> jnp.ndarray:
        return jnp.diagonal(self.cov, axis1=-2, axis2=-1)

    @property
    def stddev(self) -> jnp.ndarray:
        return jnp.sqrt(self.variance)

    def chol(self, jitter: float = 1e-10) -> jnp.ndarray:
        n = self.cov.shape[-1]
        return jnp.linalg.cholesky(self.cov + jitter * jnp.eye(n, dtype=self.cov.dtype))

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """Joint log-density of the N-dimensional vector(s) ``x`` (..., N)."""
        n = self.mean.shape[-1]
        chol = self.chol()
        diff = x - self.mean
        z = jax.scipy.linalg.solve_triangular(chol, diff[..., None], lower=True)[..., 0]
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (jnp.sum(jnp.square(z), axis=-1) + logdet + n * _LOG_2PI)

    def sample(self, key: jax.Array, sample_shape: tp.Tuple[int, ...] = ()) -> jnp.ndarray:
        chol = self.chol()
        shape = sample_shape + self.mean.shape
        eps = jax.random.normal(key, shape, dtype=self.mean.dtype)
        return self.mean + eps @ chol.T


GaussianMoments = tp.Union[DiagGaussian, FullCovGaussian]
