"""Mean-field Gaussian emulator.

Capability match for the reference's ``MeanFieldApproximation``
(``/root/reference/ensembles/models.py:73-132``): an independent Gaussian per
physical point, fitted by maximum likelihood to the realisation set.

TPU-first differences:
  * the Gaussian MLE has a closed form (sample mean / variance), which is
    also exactly where the reference's 500-step Adam loop converges — so the
    default path is closed-form and instantaneous;
  * the optional Adam refinement (``n_optim_nits > 0``) optimises a properly
    parameterised ``N(mu, softplus(raw_scale)^2)`` log-likelihood as one
    ``lax.scan`` under ``jit``, batched over ALL models at once, instead of
    a per-model Python loop (models.py:118-124).  The reference optimises an
    unconstrained "variance" and feeds it to distrax as a *scale*
    (models.py:87,110 — a quirk SURVEY SS7 says to fix, not replicate);
  * padded realisations are masked out of the likelihood.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayesian_ensembling_tpu.data import ModelCollection, Posterior, ProcessModel
from bayesian_ensembling_tpu.models.base import AbstractEmulator
from bayesian_ensembling_tpu.ops.distributions import DiagGaussian

__all__ = ["MeanField", "MeanFieldApproximation"]

_LOG_2PI = 1.8378770664093453


@functools.partial(jax.jit, static_argnames=("n_optim_nits", "learning_rate"))
def _refine_batch(
    block: jnp.ndarray,  # (M, R, N) zero-padded realisations
    mask: jnp.ndarray,  # (M, R)
    mean0: jnp.ndarray,  # (M, N)
    var0: jnp.ndarray,  # (M, N)
    n_optim_nits: int,
    learning_rate: float,
):
    """Adam MLE refinement of all models' mean-field parameters at once."""
    raw_scale0 = jnp.log(jnp.expm1(jnp.sqrt(jnp.maximum(var0, 1e-12))))
    params = {"mean": mean0, "raw_scale": raw_scale0}
    w = mask.astype(block.dtype)[:, :, None]  # (M, R, 1)

    def neg_ll(p):
        scale = jax.nn.softplus(p["raw_scale"])
        z2 = jnp.square((block - p["mean"][:, None, :]) / scale[:, None, :])
        ll = -0.5 * (z2 + 2.0 * jnp.log(scale[:, None, :]) + _LOG_2PI)
        return -jnp.sum(ll * w)

    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(neg_ll)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=n_optim_nits)
    scale = jax.nn.softplus(params["raw_scale"])
    return params["mean"], jnp.square(scale), losses


def _masked_moments(block: np.ndarray, mask: np.ndarray):
    w = mask.astype(block.dtype)[:, :, None]
    n = np.maximum(w.sum(axis=1), 1.0)
    mean = (block * w).sum(axis=1) / n
    var = (np.square(block - mean[:, None, :]) * w).sum(axis=1) / n
    # Variance floor: a single-realisation member has var == 0 exactly,
    # which turns every sigma-dividing weighter (CRPS, log-lik) into NaN for
    # the WHOLE collection after the sum-to-one normalisation.  Same floor
    # as the fused pipeline (parallel/step.emulate_marginals).
    return mean, np.maximum(var, 1e-8)


class MeanField(AbstractEmulator):
    """Mean-field Gaussian emulator (reference ``MeanFieldApproximation``)."""

    def __init__(
        self, name: str = "MeanFieldModel", dtype=jnp.float32, config=None
    ) -> None:
        super().__init__(name)
        from bayesian_ensembling_tpu.utils.config import Parameters

        # Closed-form MLE is exact, so the refinement default is 0 steps.
        self.config = config or Parameters(n_optim_nits=0)
        self.dtype = dtype

    def fit_collection(
        self,
        collection: ModelCollection,
        n_optim_nits: tp.Optional[int] = None,
        learning_rate: tp.Optional[float] = None,
        **_: tp.Any,
    ) -> tp.List[Posterior]:
        if n_optim_nits is None:
            n_optim_nits = self.config.n_optim_nits
        if learning_rate is None:
            learning_rate = self.config.learning_rate
        block, mask = collection.padded_stack(dtype=np.dtype(self.dtype))
        mean, var = _masked_moments(block, mask)
        if n_optim_nits > 0:
            mean_j, var_j, _ = _refine_batch(
                jnp.asarray(block),
                jnp.asarray(mask),
                jnp.asarray(mean),
                jnp.asarray(var),
                n_optim_nits,
                learning_rate,
            )
            mean, var = np.asarray(mean_j), np.asarray(var_j)
        posts = []
        for i, pm in enumerate(collection):
            g = DiagGaussian(mean=jnp.asarray(mean[i]), var=jnp.asarray(var[i]))
            posts.append(Posterior(gaussian=g, template=pm.blank_template()))
        return posts


MeanFieldApproximation = MeanField  # reference-familiar alias
