"""Ensemble combination schemes: W2 barycentre, multi-model means.

Capability match for ``/root/reference/ensembles/ensemble_scheme.py``.  The
reference's ``Barycentre`` runs a serial Python loop over every flattened
point calling a scalar fixed-point iteration (ensemble_scheme.py:53-69, with
a ``TODO want to parallelise this!``); here the whole combination is one
vmapped closed-form/while-loop program over all points
(ops.wasserstein.batched_gaussian_barycentre) that shards trivially over a
device mesh.
"""

from __future__ import annotations

import abc
import typing as tp

import jax.numpy as jnp
import numpy as np

from bayesian_ensembling_tpu.coords import DimArray
from bayesian_ensembling_tpu.data import ModelCollection, Posterior
from bayesian_ensembling_tpu.ops.distributions import DiagGaussian
from bayesian_ensembling_tpu.ops.wasserstein import batched_gaussian_barycentre

__all__ = [
    "AbstractEnsembleScheme",
    "Barycentre",
    "MultiModelMean",
    "WeightedModelMean",
]


class AbstractEnsembleScheme(abc.ABC):
    """Dispatch shell (reference ensemble_scheme.py:21-36)."""

    def __init__(self, name: str) -> None:
        self.name = name

    @abc.abstractmethod
    def _compute(
        self, process_models: ModelCollection, weights: tp.Optional[DimArray], **kwargs
    ) -> Posterior:
        ...

    def __call__(
        self,
        process_models: ModelCollection,
        weights: tp.Optional[DimArray] = None,
        **kwargs,
    ) -> Posterior:
        self.posterior = self._compute(process_models, weights, **kwargs)
        return self.posterior

    def plot(self, ax=None, x=None):
        """Mean ± 1σ band of the last computed ensemble posterior
        (capability match for reference ensemble_scheme.py:83-100, which
        plots ``self.distributions`` after ``__call__``)."""
        if getattr(self, "posterior", None) is None:
            raise AttributeError(
                f"{self.name} has no posterior yet — call the scheme first."
            )
        import matplotlib.pyplot as plt

        post = self.posterior
        if ax is None:
            _, ax = plt.subplots(figsize=(12, 5))
        mean = np.asarray(post.gaussian.mean).ravel()
        std = np.sqrt(np.asarray(post.gaussian.variance)).ravel()
        if x is None:
            time = post.template.coords.get("time") if post.template is not None else None
            x = np.asarray(time) if time is not None else np.arange(mean.size)
        ax.plot(x, mean, label="Ensemble mean", color="tab:blue")
        ax.fill_between(
            x,
            mean - std,
            mean + std,
            label="Ensemble one sigma",
            color="tab:blue",
            alpha=0.2,
        )
        return ax


def _weights_block(collection: ModelCollection, weights: DimArray) -> np.ndarray:
    """Weights as an (M, n_points) block aligned with the flattened posterior."""
    w = weights.values.reshape(len(collection), -1)
    n_points = collection[0].blank_template().size
    if w.shape[1] == n_points:
        return w
    if w.shape[1] == 1:  # single weight per model, broadcast over points
        return np.broadcast_to(w, (len(collection), n_points))
    raise ValueError(
        f"weights shape {weights.shape} incompatible with {n_points} points"
    )


class Barycentre(AbstractEnsembleScheme):
    """Pointwise Gaussian combination of the fitted posteriors.

    Three sigma modes (the mean is always ``sum w_i mu_i``; see
    ops.wasserstein.batched_gaussian_barycentre for the full rationale):
      * ``sigma_mode="w2"`` (default) — closed-form W2 barycentre
        ``sigma = sum_i w_i sigma_i``;
      * ``sigma_mode="compat"`` (or ``compat_fixed_point=True``) — the
        reference-faithful fixed-point iteration including its signed
        convergence test;
      * ``sigma_mode="mixture"`` — moment-matched mixture variance
        ``sigma^2 = sum w_i (sigma_i^2 + (mu_i - mu)^2)``, the calibrated
        option (adds the inter-model spread the W2 barycentre drops).
    """

    def __init__(self, name: str = "Barycentre") -> None:
        super().__init__(name)

    def _compute(
        self,
        process_models: ModelCollection,
        weights: DimArray,
        compat_fixed_point: bool = False,
        sigma_mode: str = "w2",
    ) -> Posterior:
        for pm in process_models:
            if pm.distribution is None:
                raise AttributeError(
                    f"No posterior for model {pm.name}. Please run fit() first."
                )
        means = jnp.stack([pm.distribution.gaussian.mean for pm in process_models])
        stds = jnp.stack(
            [jnp.sqrt(jnp.asarray(pm.distribution.gaussian.variance)) for pm in process_models]
        )
        w = jnp.asarray(_weights_block(process_models, weights), dtype=means.dtype)
        if compat_fixed_point:
            sigma_mode = "compat"
        if sigma_mode == "compat":
            mu, sigma, n_iters = batched_gaussian_barycentre(
                means, stds, w, compat_fixed_point=True
            )
            n_bad = int(np.sum(np.asarray(n_iters) > 200))
            if n_bad:
                import warnings

                warnings.warn(
                    f"Barycentre not converged for {n_bad} point(s) "
                    "(fixed-point cap reached; reference wasserstein.py:94-97)"
                )
        else:
            mu, sigma = batched_gaussian_barycentre(
                means, stds, w, sigma_mode=sigma_mode
            )
        template = process_models[0].blank_template()
        return Posterior(
            gaussian=DiagGaussian(mean=mu, var=jnp.square(sigma)), template=template
        )


class MultiModelMean(AbstractEnsembleScheme):
    """Pooled mean/std of all realisations from all models
    (reference ensemble_scheme.py:103-128)."""

    def __init__(self, name: str = "MultiModelMean") -> None:
        super().__init__(name)

    def _compute(
        self, process_models: ModelCollection, weights=None
    ) -> Posterior:
        pooled = np.concatenate(
            [pm.data.values.reshape(pm.n_realisations, -1) for pm in process_models],
            axis=0,
        )
        mean = pooled.mean(axis=0)
        std = pooled.std(axis=0)
        template = process_models[0].blank_template()
        return Posterior(
            gaussian=DiagGaussian(mean=jnp.asarray(mean), var=jnp.asarray(std**2)),
            template=template,
        )


class WeightedModelMean(AbstractEnsembleScheme):
    """Weighted mean of realisation statistics: ``mu = sum w_i mu_i``,
    ``var = sum w_i^2 var_i`` (reference ensemble_scheme.py:131-160)."""

    def __init__(self, name: str = "WeightedModelMean") -> None:
        super().__init__(name)

    def _compute(
        self, process_models: ModelCollection, weights: DimArray
    ) -> Posterior:
        w = _weights_block(process_models, weights)
        mus = np.stack(
            [pm.mean_across_realisations.values.ravel() for pm in process_models]
        )
        varis = np.stack(
            [pm.std_across_realisations.values.ravel() ** 2 for pm in process_models]
        )
        mean = (w * mus).sum(axis=0)
        var = (w**2 * varis).sum(axis=0)
        template = process_models[0].blank_template()
        return Posterior(
            gaussian=DiagGaussian(mean=jnp.asarray(mean), var=jnp.asarray(var)),
            template=template,
        )
