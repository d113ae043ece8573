"""Perfect-model test harness: leave-one-out validation of the ensembling
framework.

Capability match for ``PerfectModelTest``
(``/root/reference/ensembles/utils.py:32-225``): each model in turn becomes
the "pseudo truth"; the remaining models are emulated, weighted against the
pseudo observations' past, combined with the ensemble scheme over the
forecast period, and scored (NLL / RMSE / W2) against the pseudo truth, with
a pooled multi-model-mean baseline.  Results accumulate into a CSV; weight
bar charts and projection figures are written per test.

TPU-first notes: emulation of the whole leave-one-out collection is batched
(one XLA program per collection, models/gp_dtw.py), and the harness never
pickles — prefit collections round-trip through npz checkpoints
(ModelCollection.save/load replaces utils.py:22-30 + data.py:397-404).
"""

from __future__ import annotations

import copy
import os
import typing as tp

import numpy as np

from bayesian_ensembling_tpu import metrics
from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
from bayesian_ensembling_tpu.schemes import MultiModelMean
from bayesian_ensembling_tpu.weights import ModelSimilarityWeight

__all__ = ["PerfectModelTest", "batched_pmt", "load_model_collection"]


def load_model_collection(path: str) -> ModelCollection:
    """Load a checkpointed ModelCollection (reference utils.py:22-30, minus
    the pickle format and its stray ``self`` parameter)."""
    return ModelCollection.load(path)


#: library weighter class name -> batched_pmt weight_kind
BATCHED_WEIGHT_KINDS = {
    "LogLikelihoodWeight": "loglik",
    "InverseSquareWeight": "inverse_square",
    "UniformWeight": "uniform",
    "KernelSteinDiscrepancyWeight": "ksd",
    "ContinuousRankedProbabilityScoreWeight": "crps",
}


_PMT_PROGRAM = None


def _masked_mean_r(x, w_r):
    """Masked mean over the realisation axis: x (R, T), w_r (R,) floats."""
    import jax.numpy as jnp

    return jnp.einsum("rt,r->t", x, w_r) / jnp.maximum(jnp.sum(w_r), 1.0)


def _pmt_program():
    """The jitted all-folds PMT program, built once per process.

    Module-level (arrays as ARGUMENTS, config as static argnames) so that
    jax's in-memory executable cache is shared across ``batched_pmt`` calls:
    with ``pad_shape`` bucketing, the whole 7-SSP campaign re-uses ONE
    compiled program per (weighter, sigma-mode) instead of recompiling for
    every scenario's (M, R) shape.
    """
    global _PMT_PROGRAM
    if _PMT_PROGRAM is not None:
        return _PMT_PROGRAM

    import functools

    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.ops import scoring
    from bayesian_ensembling_tpu.ops.wasserstein import (
        batched_gaussian_barycentre,
        gaussian_w2_distance,
        gaussian_w2_distance_diag,
    )

    def folds(
        hist_mean,      # (M, T_h) posterior means (padded models: 0)
        hist_var,       # (M, T_h) posterior variances (padded models: 1)
        fore_mean,      # (M, T_s)
        fore_var,       # (M, T_s)
        fore_cov,       # (M, T_s, T_s) (padded: identity); with w2_diag
                        # just the (M, T_s) variances (padded: ones)
        hist_block,     # (M, R, T_h) raw realisations, zero-padded
        hist_w,         # (M, R) realisation mask as floats
        fore_block,     # (M, R, T_s)
        fore_w,         # (M, R)
        ll_table,       # (M, M, T_h) loglik table or None
        sim_pair,       # None or (diag (M,M), full (M,M), use_full (M,)) W2
        real_mask,      # (M,) float: 1 for real models, 0 for padding
        n_real,         # () int32: number of real models
        *,
        weight_kind: str,
        sigma_mode: str,
        compat_fixed_point: bool,
        w2_diag: bool,
    ):
        m, t_s = fore_mean.shape
        dtype = hist_mean.dtype
        masked_mean_r = _masked_mean_r

        # Per-model realisation means for the inverse-square scorer
        # (fold-invariant; padded models give 0/1 = 0, masked out per fold).
        hist_real_mu = jnp.einsum("mrt,mr->mt", hist_block, hist_w) / jnp.maximum(
            jnp.sum(hist_w, axis=1), 1.0
        )[:, None]

        def masked_imq_ksd(samples, grads, w_r):
            k0 = scoring.imq_k0_matrix(samples, grads)
            total = jnp.sum(k0 * (w_r[:, None] * w_r[None, :]))
            n = jnp.maximum(jnp.sum(w_r), 1.0)
            return jnp.sqrt(total) / n

        def fold_weights(i, mmask):
            obs = hist_block[i]  # (R, T_h)
            ow = hist_w[i]  # (R,)
            if weight_kind == "uniform":
                raw = jnp.ones_like(hist_mean)
            elif weight_kind == "inverse_square":
                obs_mu = masked_mean_r(obs, ow)
                # The held-out model's distance to its own obs is 0 -> guard
                # the inversion (its row is masked out below anyway).
                sq = jnp.square(hist_real_mu - obs_mu[None, :])
                raw = 1.0 / jnp.where(mmask[:, None] > 0, sq, 1.0)
            elif weight_kind == "crps":
                crps = jax.vmap(
                    lambda mu, sg: masked_mean_r(
                        scoring.gaussian_crps(obs, mu, sg), ow
                    )
                )(hist_mean, jnp.sqrt(hist_var))
                raw = 1.0 / crps
            elif weight_kind == "ksd":
                def per_model(mu, sg):
                    def per_point(mu_t, sg_t, x_t):
                        grads = -(x_t - mu_t) / jnp.square(sg_t)
                        return masked_imq_ksd(x_t, grads, ow)

                    return jax.vmap(per_point, in_axes=(0, 0, 1))(mu, sg, obs)

                ksd = jax.vmap(per_model)(hist_mean, jnp.sqrt(hist_var))
                raw = 1.0 / ksd
            elif weight_kind == "loglik":
                ll = ll_table[:, i]  # (M_model, T_h), per-model branch
                # softmax over the REMAINING models == the reduced-collection
                # softmax of the library path (weights.py LogLikelihoodWeight).
                ll = jnp.where(mmask[:, None] > 0, ll, -jnp.inf)
                return jax.nn.softmax(ll, axis=0)
            else:
                raise ValueError(f"unknown weight_kind {weight_kind!r}")
            raw = raw * mmask[:, None]
            return raw / jnp.sum(raw, axis=0, keepdims=True)

        def fold(i):
            # Padded fold lanes (i >= n_real) recompute the last real fold —
            # always-finite lanes, discarded by the caller's [:m_real] slice.
            i = jnp.minimum(i, n_real - 1)
            mmask = (jnp.arange(m) != i).astype(dtype) * real_mask
            weights_t = fold_weights(i, mmask)  # (M, T_h), sums to 1
            w = jnp.mean(weights_t, axis=1)  # time-mean, one weight per model
            if sim_pair is not None:
                # Reduced-collection similarity vector: mean over remaining
                # columns, normalised, multiplied in, renormalised
                # (PerfectModelTest._run_single_test include_sim branch).
                # The loop path's ModelSimilarityWeight picks full-cov vs
                # diag W2 on the REDUCED collection, so the dispatch is
                # per fold: use_full[i] selects the full-cov matrix only
                # when every remaining model carries a full covariance.
                pair_diag, pair_full, use_full = sim_pair
                pair = jnp.where(use_full[i], pair_full, pair_diag)
                red = pair * mmask[None, :]
                sim = jnp.sum(red, axis=1) / jnp.maximum(jnp.sum(mmask), 1.0)
                sim = sim * mmask
                sim = sim / jnp.sum(sim)
                w = w * sim
                w = w / jnp.sum(w)

            w_b = jnp.broadcast_to(w[:, None], (m, t_s))
            if compat_fixed_point or sigma_mode == "compat":
                bary_mu, bary_sigma, n_it = batched_gaussian_barycentre(
                    fore_mean, jnp.sqrt(fore_var), w_b, compat_fixed_point=True
                )
                # The loop path (schemes.Barycentre) warns on points that hit
                # the 200-iteration cap; carry the per-fold count out so
                # batched_pmt can emit the same diagnostic.
                n_fp_bad = jnp.sum(n_it > 200)
            else:
                bary_mu, bary_sigma = batched_gaussian_barycentre(
                    fore_mean, jnp.sqrt(fore_var), w_b, sigma_mode=sigma_mode
                )
                n_fp_bad = jnp.zeros((), jnp.int32)

            truth = fore_block[i]  # (R, T_s)
            tw = fore_w[i]

            def nll_of(mu, var):
                ll = scoring.diag_log_likelihood(mu, var, truth)  # (R, T_s)
                return -jnp.sum(ll * tw[:, None]) / (
                    jnp.maximum(jnp.sum(tw), 1.0) * t_s
                )

            def rmse_of(mu):
                se = jnp.square(mu[None, :] - truth)
                return jnp.mean(
                    jnp.sqrt(
                        jnp.einsum("rt,r->t", se, tw)
                        / jnp.maximum(jnp.sum(tw), 1.0)
                    )
                )

            def crps_of(mu, sigma):
                # metrics.crps semantics: mean over valid realisations per
                # point (masked), then mean over time.
                c = scoring.gaussian_crps(truth, mu[None, :], sigma[None, :])
                return jnp.sum(c * tw[:, None]) / (
                    jnp.maximum(jnp.sum(tw), 1.0) * t_s
                )

            nll_b = nll_of(bary_mu, jnp.square(bary_sigma))
            rmse_b = rmse_of(bary_mu)
            crps_b = crps_of(bary_mu, bary_sigma)
            if w2_diag:
                # All forecast posteriors are diagonal: the closed-form diag
                # W2 equals the dense-embedded full-matrix W2 (tested in
                # test_wasserstein) without the (M, T_s, T_s) embedding or
                # the two eigendecompositions per fold.
                w2_b = gaussian_w2_distance_diag(
                    bary_mu, jnp.square(bary_sigma), fore_mean[i], fore_cov[i]
                )
            else:
                w2_b = gaussian_w2_distance(
                    bary_mu,
                    jnp.diag(jnp.square(bary_sigma)),
                    fore_mean[i],
                    fore_cov[i],
                )

            # Pooled multi-model-mean baseline over the remaining models
            # (population std, schemes.MultiModelMean semantics).
            pw = fore_w * mmask[:, None]  # (M, R)
            cnt = jnp.maximum(jnp.sum(pw), 1.0)
            mmm_mu = jnp.einsum("mrt,mr->t", fore_block, pw) / cnt
            mmm_var = (
                jnp.einsum("mrt,mr->t", jnp.square(fore_block), pw) / cnt
                - jnp.square(mmm_mu)
            )
            mmm_var = jnp.maximum(mmm_var, 1e-12)
            nll_m = nll_of(mmm_mu, mmm_var)
            rmse_m = rmse_of(mmm_mu)
            crps_m = crps_of(mmm_mu, jnp.sqrt(mmm_var))
            if w2_diag:
                w2_m = gaussian_w2_distance_diag(
                    mmm_mu, mmm_var, fore_mean[i], fore_cov[i]
                )
            else:
                w2_m = gaussian_w2_distance(
                    mmm_mu, jnp.diag(mmm_var), fore_mean[i], fore_cov[i]
                )
            metrics = jnp.stack(
                [nll_b, rmse_b, w2_b, crps_b, nll_m, rmse_m, w2_m, crps_m]
            )
            # The per-fold combination products ride along for free (already
            # computed for the metrics) so the caller can draw the
            # reference's weight/projection figures without a second pass.
            return metrics, w, bary_mu, bary_sigma, mmm_mu, mmm_var, n_fp_bad

        return jax.vmap(fold)(jnp.arange(m))

    _PMT_PROGRAM = jax.jit(
        folds,
        static_argnames=(
            "weight_kind",
            "sigma_mode",
            "compat_fixed_point",
            "w2_diag",
        ),
    )
    return _PMT_PROGRAM


def batched_pmt(
    hindcast_models: ModelCollection,
    forecast_models: ModelCollection,
    weight_kind: str,
    *,
    compat_fixed_point: bool = False,
    sigma_mode: str = "w2",
    include_sim: bool = False,
    pad_shape: tp.Optional[tp.Tuple[int, int]] = None,
    return_details: bool = False,
) -> np.ndarray:
    """ALL leave-one-out folds of the perfect-model test as ONE jitted
    program.

    The reference's PMT driver is a serial Python loop over pseudo-truth
    models (utils.py:184-225), each fold re-running the weight -> combine ->
    score pipeline; with prefit posteriors every fold is pure array math, so
    here the folds are vmapped over the leave-one-out index with a model
    mask — the last remaining Python hot loop of the reference's call
    stacks (SURVEY §3.4) becomes one XLA program.

    Matches ``PerfectModelTest.run(use_prefit_models=True)`` numerically for
    the five campaign weighters (``BATCHED_WEIGHT_KINDS``), including the
    full-covariance constant-vector log-likelihood branch and the
    reference-faithful fixed-point barycentre under ``compat_fixed_point``;
    equality is tested in ``tests/test_validation.py``.

    Args:
      hindcast_models / forecast_models: PREFIT collections (posteriors set).
      weight_kind: one of crps / loglik / ksd / inverse_square / uniform.
      pad_shape: optional ``(pad_m, pad_r)`` shape bucket.  The model and
        realisation axes are zero-padded (with masks) up to these sizes so
        that collections of different (M, R) — e.g. the 7 SSP scenarios —
        all hit ONE compiled program per (weighter, sigma-mode); padded fold
        lanes recompute the last real fold and are sliced off the result.
      return_details: also return the per-fold combination products as a
        dict (``weights`` (M, M) fold x model time-mean weights,
        ``bary_mean``/``bary_sigma``/``mmm_mean``/``mmm_var`` (M, T_s)) for
        the reference's per-fold figures (utils.py:121-179).

    Returns:
      ``(n_models, 8)`` float array, columns
      ``[nll_bary, rmse_bary, w2_bary, crps_bary, nll_mmm, rmse_mmm,
      w2_mmm, crps_mmm]`` in
      leave-one-out order (fold i = model i as pseudo truth); with
      ``return_details`` a ``(metrics, details)`` tuple.
    """
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.ops import scoring
    from bayesian_ensembling_tpu.ops.distributions import FullCovGaussian

    m = len(hindcast_models)
    if m < 2:
        # The loop path fails loudly inside the weighter on the empty
        # reduced collection; with the batched masked reductions a single
        # model would instead produce silent 0/0 = NaN weights.
        raise ValueError(
            f"batched_pmt needs at least 2 models (got {m}): leave-one-out "
            "folds weight the remaining models against the held-out one"
        )
    hist_mean = jnp.stack(
        [jnp.asarray(pm.distribution.gaussian.mean) for pm in hindcast_models]
    )
    hist_var = jnp.stack(
        [jnp.asarray(pm.distribution.gaussian.variance) for pm in hindcast_models]
    )
    fore_mean = jnp.stack(
        [jnp.asarray(pm.distribution.gaussian.mean) for pm in forecast_models]
    )
    fore_var = jnp.stack(
        [jnp.asarray(pm.distribution.gaussian.variance) for pm in forecast_models]
    )
    dtype = hist_mean.dtype
    # Stack raw realisations at the POSTERIOR dtype — the default f32 stack
    # would silently truncate the float64 oracle path's data.
    hist_block, hist_rmask = hindcast_models.padded_stack(dtype=np.dtype(str(dtype)))
    fore_block, fore_rmask = forecast_models.padded_stack(dtype=np.dtype(str(dtype)))
    t_s = fore_mean.shape[1]
    # With all-diagonal forecast posteriors (the common case) the fold W2 is
    # the closed-form diagonal one: skip the (M, T_s, T_s) dense embedding
    # and its two eigendecompositions per fold entirely (at monthly
    # resolution the embedding alone is ~M x 4 MB of HBM).
    w2_diag = not any(
        isinstance(pm.distribution.gaussian, FullCovGaussian)
        for pm in forecast_models
    )
    if w2_diag:
        fore_cov = fore_var
    else:
        fore_cov = jnp.stack(
            [
                jnp.asarray(pm.distribution.gaussian.cov)
                if isinstance(pm.distribution.gaussian, FullCovGaussian)
                else jnp.diag(jnp.asarray(pm.distribution.gaussian.variance))
                for pm in forecast_models
            ]
        )
    hist_block = jnp.asarray(hist_block, dtype)
    fore_block = jnp.asarray(fore_block, dtype)
    hist_w = jnp.asarray(hist_rmask, dtype)
    fore_w = jnp.asarray(fore_rmask, dtype)

    if include_sim:
        # Pairwise W2 matrices over the hindcast posteriors, computed ONCE;
        # each fold takes its reduced row-means (ModelSimilarityWeight
        # mode="single" on the reduced collection uses exactly these
        # entries, diagonal included).  The library weighter decides
        # full-cov vs diag W2 per REDUCED collection, so both matrices are
        # carried with a per-fold selector (use_full[i] = every model other
        # than i is full-cov); mixed collections then match run() exactly.
        from bayesian_ensembling_tpu.ops.wasserstein import (
            gaussian_w2_distance,
            gaussian_w2_distance_diag,
        )

        if m < 3:
            # The loop path fails loudly inside ModelSimilarityWeight (the
            # reduced collection has a single model); with the batched
            # masked reduction it would be a silent 0/0 = NaN instead.
            raise ValueError(
                f"include_sim needs at least 3 models (got {m}): each "
                "leave-one-out fold computes similarity over the remaining "
                "models, and one model has no one to be similar to"
            )
        full_flags = np.array(
            [
                isinstance(pm.distribution.gaussian, FullCovGaussian)
                for pm in hindcast_models
            ]
        )
        use_full = np.array(
            [full_flags[np.arange(m) != i].all() for i in range(m)]
        )
        sim_diag = jax.vmap(
            jax.vmap(gaussian_w2_distance_diag, in_axes=(None, None, 0, 0)),
            in_axes=(0, 0, None, None),
        )(hist_mean, hist_var, hist_mean, hist_var)
        if use_full.any():
            # Diag members are diag-embedded; their rows/columns are never
            # selected on a use_full fold (the fold mask excludes them).
            hist_covs = jnp.stack(
                [
                    jnp.asarray(pm.distribution.gaussian.cov)
                    if isinstance(pm.distribution.gaussian, FullCovGaussian)
                    else jnp.diag(jnp.asarray(pm.distribution.gaussian.variance))
                    for pm in hindcast_models
                ]
            )
            sim_full = jax.vmap(
                jax.vmap(gaussian_w2_distance, in_axes=(None, None, 0, 0)),
                in_axes=(0, 0, None, None),
            )(hist_mean, hist_covs, hist_mean, hist_covs)
        else:
            sim_full = sim_diag
        sim_pair = (sim_diag, sim_full, jnp.asarray(use_full))
    else:
        sim_pair = None

    # ---- shape bucketing: pad the model and realisation axes so different
    # collections share one compiled program (see the pad_shape docstring).
    if pad_shape is not None:
        pad_m, pad_r = pad_shape
        r_have = max(hist_block.shape[1], fore_block.shape[1])
        if pad_m < m or pad_r < r_have:
            raise ValueError(
                f"pad_shape {pad_shape} smaller than data (M={m}, R={r_have})"
            )

        def jpad(a, axis, n, value=0.0):
            grow = n - a.shape[axis]
            if grow == 0:
                return a
            widths = [(0, 0)] * a.ndim
            widths[axis] = (0, grow)
            return jnp.pad(a, widths, constant_values=value)

        hist_mean = jpad(hist_mean, 0, pad_m)
        hist_var = jpad(hist_var, 0, pad_m, 1.0)  # benign sigma for padding
        fore_mean = jpad(fore_mean, 0, pad_m)
        fore_var = jpad(fore_var, 0, pad_m, 1.0)
        if w2_diag:
            fore_cov = jpad(fore_cov, 0, pad_m, 1.0)  # benign unit variances
        else:
            grow = pad_m - fore_cov.shape[0]
            if grow:
                fore_cov = jnp.concatenate(
                    [
                        fore_cov,
                        jnp.broadcast_to(
                            jnp.eye(t_s, dtype=dtype), (grow, t_s, t_s)
                        ),
                    ],
                    axis=0,
                )
        hist_block = jpad(jpad(hist_block, 1, pad_r), 0, pad_m)
        fore_block = jpad(jpad(fore_block, 1, pad_r), 0, pad_m)
        hist_w = jpad(jpad(hist_w, 1, pad_r), 0, pad_m)
        fore_w = jpad(jpad(fore_w, 1, pad_r), 0, pad_m)
        if sim_pair is not None:
            sd, sf, uf = sim_pair
            sim_pair = (
                jpad(jpad(sd, 0, pad_m), 1, pad_m),
                jpad(jpad(sf, 0, pad_m), 1, pad_m),
                jpad(uf, 0, pad_m),  # padded folds: use_full False (diag)
            )
    m_pad = hist_mean.shape[0]
    real_mask = (jnp.arange(m_pad) < m).astype(dtype)
    masked_mean_r = _masked_mean_r

    if weight_kind == "loglik":
        # Per-(model, pseudo-obs) mean log-likelihood table, precomputed
        # OUTSIDE the fold vmap with each model's OWN branch — full-cov
        # constant-vector where the posterior carries a covariance, diag
        # otherwise — so mixed collections match the library path exactly
        # (weights.py:165-180 dispatches per model, not per collection).
        def model_ll(pm, mean_m, var_m):
            g = pm.distribution.gaussian
            if isinstance(g, FullCovGaussian):
                ch = jnp.asarray(g.chol())
                score_fn = lambda ob: scoring.fullcov_constant_vector_log_likelihood(
                    mean_m, ch, ob
                )
            else:
                score_fn = lambda ob: scoring.diag_log_likelihood(mean_m, var_m, ob)
            ll_folds = jax.vmap(score_fn)(hist_block)  # (M_fold, R, T_h)
            return jax.vmap(masked_mean_r)(ll_folds, hist_w)  # (M_fold, T_h)

        ll_table = jnp.stack(
            [
                model_ll(pm, hist_mean[mi], hist_var[mi])
                for mi, pm in enumerate(hindcast_models)
            ]
        )  # (M_model, M_fold, T_h); fold axis is already padded via hist_block
        if ll_table.shape[0] < m_pad:
            ll_table = jnp.pad(
                ll_table, ((0, m_pad - ll_table.shape[0]), (0, 0), (0, 0))
            )
    else:
        ll_table = None

    metrics, w, bary_mu, bary_sigma, mmm_mu, mmm_var, n_fp_bad = _pmt_program()(
        hist_mean,
        hist_var,
        fore_mean,
        fore_var,
        fore_cov,
        hist_block,
        hist_w,
        fore_block,
        fore_w,
        ll_table,
        sim_pair,
        real_mask,
        jnp.asarray(m, jnp.int32),
        weight_kind=weight_kind,
        sigma_mode=sigma_mode,
        compat_fixed_point=bool(compat_fixed_point),
        w2_diag=w2_diag,
    )
    if compat_fixed_point or sigma_mode == "compat":
        # Same diagnostic the loop path's schemes.Barycentre emits per fold.
        n_bad = int(np.sum(np.asarray(n_fp_bad)[:m]))
        if n_bad:
            import warnings

            warnings.warn(
                f"Barycentre not converged for {n_bad} point(s) across folds "
                "(fixed-point cap reached; reference wasserstein.py:94-97)"
            )
    if not return_details:
        return np.asarray(metrics)[:m]
    details = {
        "weights": np.asarray(w)[:m, :m],
        "bary_mean": np.asarray(bary_mu)[:m],
        "bary_sigma": np.asarray(bary_sigma)[:m],
        "mmm_mean": np.asarray(mmm_mu)[:m],
        "mmm_var": np.asarray(mmm_var)[:m],
    }
    return np.asarray(metrics)[:m], details


class PerfectModelTest:
    """Leave-one-out ensembling validation."""

    def __init__(
        self,
        hindcast_models: ModelCollection,
        forecast_models: ModelCollection,
        emulate_method: tp.Callable,
        weight_method: tp.Callable,
        ensemble_method: tp.Callable,
        ssp: str,
        include_sim: bool = False,
        save_dir: tp.Optional[str] = None,
        scheme_kwargs: tp.Optional[dict] = None,
    ) -> None:
        if hindcast_models.model_names != forecast_models.model_names:
            raise ValueError("hindcast and forecast collections must match")
        self.hindcast_models = hindcast_models
        self.forecast_models = forecast_models
        self.emulate_method = emulate_method
        self.weight_method = weight_method
        self.ensemble_method = ensemble_method
        self.ssp = ssp
        self.include_sim = include_sim
        self.save_dir = save_dir
        # Extra kwargs for the ensemble scheme call — e.g.
        # {"compat_fixed_point": True} to validate with the reference's
        # sigma-inflating fixed-point barycentre (wasserstein.py:82-97 there).
        self.scheme_kwargs = scheme_kwargs or {}
        if save_dir:
            self.fig_dir = os.path.join(save_dir, "figs")
            self.csv_dir = os.path.join(save_dir, "csvs")
            for d in (
                os.path.join(self.fig_dir, "weights"),
                os.path.join(self.fig_dir, "projs"),
                self.csv_dir,
            ):
                os.makedirs(d, exist_ok=True)

    # ------------------------------------------------------------------ core
    def _run_single_test(
        self,
        hindcast: ModelCollection,
        forecast: ModelCollection,
        pseudo_past: ProcessModel,
        pseudo_future: ProcessModel,
        n_optim_nits: int = 1000,
        use_prefit_models: bool = False,
        **fit_kwargs,
    ):
        if not use_prefit_models:
            hindcast.fit(
                self.emulate_method(), n_optim_nits=n_optim_nits, **fit_kwargs
            )
            forecast.fit(
                self.emulate_method(), n_optim_nits=n_optim_nits, **fit_kwargs
            )
            pseudo_future.distribution = self.emulate_method().fit(
                pseudo_future, n_optim_nits=n_optim_nits, **fit_kwargs
            )

        weight_fn = self.weight_method()
        weights = weight_fn(hindcast, pseudo_past)
        mean_weights = (
            weights.mean("time") if "time" in weights.dims else weights
        )
        if self.include_sim:
            sim = ModelSimilarityWeight()(hindcast, mode="single")
            total = mean_weights.values * np.asarray(sim.values).ravel()
            total = total / total.sum()
        else:
            total = mean_weights.values

        if self.save_dir:
            self._plot_weights(
                forecast.model_names, total, weight_fn.name, pseudo_future.name
            )

        w_fore = np.broadcast_to(
            total[:, None], (len(forecast), len(forecast.time))
        )
        from bayesian_ensembling_tpu.coords import DimArray

        w_da = DimArray(
            np.ascontiguousarray(w_fore),
            ("model", "time"),
            {"time": forecast.time},
        )
        bary = self.ensemble_method()(forecast, w_da, **self.scheme_kwargs)

        obs_vals = pseudo_future.data.values
        nll_b = metrics.nll(bary, obs_vals)
        rmse_b = metrics.rmse(bary, obs_vals)
        w2_b = metrics.w2_between_posteriors(bary, pseudo_future.distribution)
        crps_b = metrics.crps(bary, obs_vals)

        # Multi-model-mean baseline (utils.py:148-155).
        mmm = MultiModelMean()(forecast)
        nll_m = metrics.nll(mmm, obs_vals)
        rmse_m = metrics.rmse(mmm, obs_vals)
        w2_m = metrics.w2_between_posteriors(mmm, pseudo_future.distribution)
        crps_m = metrics.crps(mmm, obs_vals)

        if self.save_dir:
            self._plot_projection(bary, mmm, pseudo_future, weight_fn.name)

        return nll_b, rmse_b, w2_b, crps_b, nll_m, rmse_m, w2_m, crps_m

    def run(
        self,
        n_optim_nits: int = 1000,
        use_prefit_models: bool = False,
        **fit_kwargs,
    ):
        """Leave-one-out over every model; returns a pandas DataFrame and
        (when save_dir is set) writes the CSV (utils.py:184-225).

        Extra ``fit_kwargs`` (e.g. ``fit_chunk_steps``, ``time_stride`` /
        ``fine_steps`` for the coarse-to-fine-in-time monthly fit) are
        forwarded to every per-fold emulator fit."""
        import pandas as pd

        wname = self.weight_method().name
        rows = []
        n = len(self.hindcast_models)
        for i in range(n):
            hind = [copy.copy(m) for m in self.hindcast_models]
            fore = [copy.copy(m) for m in self.forecast_models]
            pseudo_past = hind.pop(i)
            pseudo_future = fore.pop(i)
            out = self._run_single_test(
                ModelCollection(hind),
                ModelCollection(fore),
                pseudo_past,
                pseudo_future,
                n_optim_nits=n_optim_nits,
                use_prefit_models=use_prefit_models,
                **fit_kwargs,
            )
            rows.append([pseudo_past.name, *out])

        df = pd.DataFrame(
            rows,
            columns=[
                "model as pseudo obs",
                f"nll_bary_{wname}",
                f"rmse_bary_{wname}",
                f"w2_bary_{wname}",
                f"crps_bary_{wname}",
                "nll_mmm",
                "rmse_mmm",
                "w2_mmm",
                "crps_mmm",
            ],
        )
        if self.save_dir:
            self._save_csv(df, wname)
        return df

    def _weight_suffix(self, wname: str) -> str:
        """One naming scheme for every result artifact (CSVs + figures)."""
        return f"{wname}_plus_sim" if self.include_sim else wname

    def _save_csv(self, df, wname: str) -> None:
        path = os.path.join(
            self.csv_dir,
            f"perfect_model_test_results_{self._weight_suffix(wname)}_{self.ssp}.csv",
        )
        df.to_csv(path)
        print(f"Saved results to {path}")

    def run_batched(
        self,
        pad_shape: tp.Optional[tp.Tuple[int, int]] = None,
        figures: bool = False,
    ):
        """All leave-one-out folds in one XLA program (``batched_pmt``).

        Requires prefit collections (posteriors set), the Barycentre scheme,
        and a weighter in ``BATCHED_WEIGHT_KINDS``; produces the same
        DataFrame as ``run(use_prefit_models=True)`` (figures opt-in via
        ``figures=True``: the per-fold weight bar chart and projection
        figure come from the batched program's own outputs), including
        the ``include_sim`` similarity multiplier.  Equality with the loop
        path is tested in tests/test_validation.py.

        ``pad_shape=(pad_m, pad_r)`` buckets the program shape so a campaign
        over scenarios with different model/realisation counts compiles one
        program per weighter (see ``batched_pmt``).
        """
        import pandas as pd

        if figures and not self.save_dir:
            raise ValueError(
                "run_batched(figures=True) writes figures under save_dir; "
                "construct PerfectModelTest with save_dir set"
            )
        wname = self.weight_method().name
        kind = BATCHED_WEIGHT_KINDS.get(wname)
        if kind is None:
            raise ValueError(
                f"{wname} has no batched scoring path; use run() "
                f"(supported: {sorted(BATCHED_WEIGHT_KINDS)})"
            )
        from bayesian_ensembling_tpu.schemes import Barycentre

        if not (
            isinstance(self.ensemble_method, type)
            and issubclass(self.ensemble_method, Barycentre)
        ):
            name = getattr(
                self.ensemble_method, "__name__", repr(self.ensemble_method)
            )
            raise ValueError(
                f"run_batched computes the Barycentre combine; "
                f"{name} needs run()"
            )
        unfitted = [
            pm.name
            for mc in (self.hindcast_models, self.forecast_models)
            for pm in mc
            if pm.distribution is None
        ]
        if unfitted:
            raise ValueError(
                f"run_batched needs PREFIT collections; missing posteriors "
                f"for {sorted(set(unfitted))}"
            )
        out, details = batched_pmt(
            self.hindcast_models,
            self.forecast_models,
            kind,
            compat_fixed_point=bool(
                self.scheme_kwargs.get("compat_fixed_point", False)
            ),
            sigma_mode=self.scheme_kwargs.get("sigma_mode", "w2"),
            include_sim=self.include_sim,
            pad_shape=pad_shape,
            return_details=True,
        )
        df = pd.DataFrame(
            out,
            columns=[
                f"nll_bary_{wname}",
                f"rmse_bary_{wname}",
                f"w2_bary_{wname}",
                f"crps_bary_{wname}",
                "nll_mmm",
                "rmse_mmm",
                "w2_mmm",
                "crps_mmm",
            ],
        )
        df.insert(0, "model as pseudo obs", list(self.hindcast_models.model_names))
        if self.save_dir:
            self._save_csv(df, wname)
            if figures:
                self._plot_batched_folds(details, wname)
        return df

    def _plot_batched_folds(self, details, wname):
        """The reference's per-fold weight bar chart and projection figure
        (utils.py:121-131,163-179), drawn from the batched program's
        per-fold combination products."""
        from bayesian_ensembling_tpu.data import Posterior
        from bayesian_ensembling_tpu.ops.distributions import DiagGaussian

        names = list(self.forecast_models.model_names)
        template = self.forecast_models[0].blank_template()
        for i, pseudo_name in enumerate(names):
            others = [j for j in range(len(names)) if j != i]
            self._plot_weights(
                [names[j] for j in others],
                details["weights"][i, others],
                wname,
                pseudo_name,
            )
            bary = Posterior(
                gaussian=DiagGaussian(
                    mean=details["bary_mean"][i],
                    var=details["bary_sigma"][i] ** 2,
                ),
                template=template,
            )
            mmm = Posterior(
                gaussian=DiagGaussian(
                    mean=details["mmm_mean"][i], var=details["mmm_var"][i]
                ),
                template=template,
            )
            self._plot_projection(bary, mmm, self.forecast_models[i], wname)

    # --------------------------------------------------------------- figures
    def _plot_weights(self, model_names, total, wname, pseudo_name):
        import matplotlib.pyplot as plt

        plt.figure()
        plt.bar(list(model_names), np.asarray(total))
        plt.ylabel("Weights")
        plt.xticks(rotation="vertical")
        suffix = self._weight_suffix(wname)
        path = os.path.join(
            self.fig_dir,
            "weights",
            f"{suffix}_with_{pseudo_name}_as_pseudo_truth_{self.ssp}.png",
        )
        plt.savefig(path, bbox_inches="tight")
        plt.close()

    def _plot_projection(self, bary, mmm, pseudo_future, wname):
        import matplotlib.pyplot as plt

        from bayesian_ensembling_tpu.plotters import cmap, plot_posterior_temporal

        fig, ax = plt.subplots(figsize=(6.5, 4))
        plot_posterior_temporal(bary, ax=ax, color=cmap()[0], label="Barycentre", n_sigma=(2,))
        if pseudo_future.distribution is not None:
            plot_posterior_temporal(
                pseudo_future.distribution, ax=ax, color=cmap()[1],
                label="True model", n_sigma=(2,),
            )
        plot_posterior_temporal(mmm, ax=ax, color=cmap()[2], label="MMM", n_sigma=(2,))
        ax.set_xlabel("Time")
        ax.set_ylabel("Temperature anomaly (degC)\nrelative to 1961-1990")
        ax.legend()
        suffix = self._weight_suffix(wname)
        path = os.path.join(
            self.fig_dir,
            "projs",
            f"{pseudo_future.name}_as_pseudo_truth_{suffix}_{self.ssp}.png",
        )
        fig.savefig(path)
        plt.close(fig)
