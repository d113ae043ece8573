"""The fused ensemble step: fit -> weight -> combine as ONE XLA program.

This is the TPU performance path and the multi-chip sharding surface.  The
reference runs the same logic as three separate Python stages with nested
loops (SURVEY SS3.1-3.3); here the entire scenario —

    DBA barycentres -> batched GP hyperparameter optimisation -> posterior
    marginals -> CRPS (or log-likelihood) weights -> sum-to-one normalisation
    -> time-mean broadcast -> W2 barycentre

— is a single jitted function of device arrays.  Sharding: the *model* axis
is the data-parallel axis (one climate model's emulation is independent of
the others until the weight normalisation), so inputs are sharded
``P('model', ...)`` over the mesh and XLA inserts the only two collectives
where the math actually couples models: the weight-normalisation sum and the
barycentre weighted sums (reference couplings at weights.py:123,511 and
wasserstein.py:86,98).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from bayesian_ensembling_tpu.ops import gp as gp_ops
from bayesian_ensembling_tpu.ops import scoring

__all__ = [
    "emulate_marginals",
    "chunked_marginals",
    "fused_raw_weights",
    "ensemble_scenario_step",
    "ensemble_multi_scenario_step",
    "multi_scenario_tail",
    "refined_multi_scenario_f64",
    "make_sharded_step",
    "make_sharded_multi_scenario_step",
    "WEIGHT_KINDS",
]

# Every reference weighter is available inside the fused step
# (reference weights.py:56-515; VERDICT r1 asked for all six).
# ``similarity`` is the reference's *temporal* mode (one weight per model
# per timestep); ``similarity_single`` is its *single* mode (one
# whole-series weight per model, broadcast over time).  The reference's
# third mode, ``spatial`` (one weight per model per grid cell,
# weights.py:268-300), is ``similarity_single`` applied inside the per-cell
# vmapped gridded step (parallel/gridded.py) — each cell reduces over its
# own time axis, which is exactly the spatial-mode reduction.
WEIGHT_KINDS = (
    "crps",
    "loglik",
    "ksd",
    "inverse_square",
    "uniform",
    "similarity",
    "similarity_single",
)


def fused_raw_weights(
    weight_kind: str,
    hist_mean: jnp.ndarray,  # (M, T) posterior marginal means
    hist_var: jnp.ndarray,  # (M, T) posterior marginal variances (incl. noise)
    obs: jnp.ndarray,  # (R_obs, T)
    hist_block: tp.Optional[jnp.ndarray] = None,  # (M, R, T) raw realisations
    hist_mask: tp.Optional[jnp.ndarray] = None,  # (M, R)
    model_mask: tp.Optional[jnp.ndarray] = None,  # (M,) 1 = real, 0 = padded
    model_axis: tp.Optional[str] = None,  # shard_map axis name, if sharded
) -> jnp.ndarray:
    """Raw (un-normalised) weight scores ``(M, T)`` inside the fused step.

    One vectorised expression per reference weighter, matching the library
    path (weights.py) on diagonal posteriors:
      * ``crps``           — 1 / closed-form Gaussian CRPS (weights.py:444-515)
      * ``loglik``         — exp(mean obs log-likelihood) (weights.py:56-131)
      * ``ksd``            — 1 / IMQ kernel Stein discrepancy (weights.py:336-441)
      * ``inverse_square`` — (realisation-mean − obs-mean)^-2 (weights.py:134-174)
      * ``uniform``        — constant (weights.py:177-212)
      * ``similarity``     — mean-over-j pairwise W2 dissimilarity,
        *temporal* mode (weights.py:302-325)
      * ``similarity_single`` — the reference's *single* mode
        (weights.py:240-266): one whole-series pairwise W2 per model,
        broadcast over time; applied inside the per-cell gridded step this
        is the *spatial* mode's per-cell reduction (weights.py:268-300).
        The similarity weighters are the only ones that couple models
        *pairwise*, so under model-axis sharding they all-gather the
        (small) marginal moments over ``model_axis``.
    """
    # Reciprocal scorers (1/CRPS, 1/KSD, 1/sq-distance) floor the score:
    # an EXACT zero (a model marginal identical to the observation mean at
    # one timestep — constant series, synthetic data) would otherwise
    # produce inf, and inf/inf = NaN poisons the whole scenario through the
    # sum-to-one normalisation.  The floor is sqrt(tiny) (~1e-19 at f32),
    # NOT tiny itself: 1/tiny = 8.5e37, so four-plus floored models would
    # overflow the per-timestep weight SUM to inf and the normalisation
    # would silently zero every weight at that timestep; 1/sqrt(tiny) leaves
    # ~1e19 of summation headroom while still sitting far under every
    # parity tolerance (real scores are >~1e-10).  The library path keeps
    # the reference's unguarded form (weights.py:157-174) for bit-parity.
    def _recip(score):
        floor = jnp.sqrt(jnp.finfo(score.dtype).tiny)
        return 1.0 / jnp.maximum(score, floor)

    if weight_kind == "crps":
        score = jax.vmap(scoring.mean_gaussian_crps, in_axes=(0, 0, None))(
            hist_mean, jnp.sqrt(hist_var), obs
        )
        return _recip(score)
    if weight_kind == "loglik":
        ll = jax.vmap(scoring.diag_log_likelihood, in_axes=(0, 0, None))(
            hist_mean, hist_var, obs
        )  # (M, R_obs, T)
        ll = jnp.mean(ll, axis=1)
        # Subtract the per-point max over models before exp (a pmax when the
        # model axis is sharded): the downstream sum-to-one normalisation is
        # invariant to the shift, and naive exp underflows to all-zero
        # weights -> NaN at f32 for log-likelihoods below ~-88 (the same
        # failure the library path fixes via softmax, weights.py:176-180).
        # Padded models are excluded from the max — a junk padded row with a
        # spuriously high log-likelihood would otherwise shrink the real
        # models' exp(ll - m) headroom and reintroduce the underflow; their
        # own rows exp(-inf) to exactly 0 (callers also mask downstream).
        if model_mask is not None:
            ll = jnp.where(model_mask[:, None] > 0, ll, -jnp.inf)
        m = jnp.max(ll, axis=0, keepdims=True)
        if model_axis is not None:
            m = jax.lax.pmax(m, model_axis)
        return jnp.exp(ll - m)
    if weight_kind == "ksd":
        ksd = jax.vmap(scoring.batched_imq_ksd, in_axes=(0, 0, None))(
            hist_mean, jnp.sqrt(hist_var), obs
        )
        return _recip(ksd)
    if weight_kind == "inverse_square":
        if hist_block is None or hist_mask is None:
            raise ValueError("inverse_square needs the raw realisation block")
        w = hist_mask.astype(hist_block.dtype)
        n = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        mu = jnp.einsum("mrt,mr->mt", hist_block, w) / n[:, None]
        obs_mean = jnp.mean(obs, axis=0)
        return _recip(jnp.square(mu - obs_mean[None, :]))
    if weight_kind == "uniform":
        return jnp.ones_like(hist_mean)
    if weight_kind in ("similarity", "similarity_single"):
        std = jnp.sqrt(hist_var)
        if model_axis is not None:
            mean_all = jax.lax.all_gather(hist_mean, model_axis, tiled=True)
            std_all = jax.lax.all_gather(std, model_axis, tiled=True)
            mask_all = (
                jax.lax.all_gather(model_mask, model_axis, tiled=True)
                if model_mask is not None
                else None
            )
        else:
            mean_all, std_all, mask_all = hist_mean, std, model_mask
        d_mu = hist_mean[:, None, :] - mean_all[None, :, :]  # (M_local, M_total, T)
        d_sd = std[:, None, :] - std_all[None, :, :]
        if weight_kind == "similarity_single":
            # Whole-series diag W2 per pair (reference 'single' mode,
            # weights.py:240-266, incl. the un-squared mean norm):
            # ||d_mu||_2 over time + sum_t d_sd^2 -> one scalar per pair.
            pair = jnp.sqrt(jnp.sum(jnp.square(d_mu), axis=-1)) + jnp.sum(
                jnp.square(d_sd), axis=-1
            )  # (M_local, M_total)
            if mask_all is not None:
                valid = mask_all.astype(pair.dtype)
                vec = pair @ valid / jnp.maximum(jnp.sum(valid), 1.0)
            else:
                vec = jnp.mean(pair, axis=1)
            return jnp.broadcast_to(vec[:, None], hist_mean.shape)
        # 'temporal' mode: per-timestep scalar W2 per pair.
        pair = jnp.abs(d_mu) + jnp.square(d_sd)  # (M_local, M_total, T)
        if mask_all is not None:
            valid = mask_all.astype(pair.dtype)
            return jnp.einsum("ijt,j->it", pair, valid) / jnp.maximum(
                jnp.sum(valid), 1.0
            )
        return jnp.mean(pair, axis=1)
    raise ValueError(f"unknown weight_kind {weight_kind!r}; one of {WEIGHT_KINDS}")


def emulate_marginals(
    block: jnp.ndarray,  # (M, R, T) zero-padded realisations
    mask: jnp.ndarray,  # (M, R)
    kernel_name: str = "matern32",
    n_optim_nits: int = 500,
    learning_rate: float = 0.01,
    dba_iterations: int = 10,
    dba_method: str = "classic",
    dba_tol: tp.Optional[float] = None,
    jitter: float = 1e-6,
    optimizer: str = "adam",
    gp_init=None,
    return_params: bool = False,
    return_targets: bool = False,
    time_stride: int = 1,
    fine_steps: tp.Optional[int] = None,
):
    """Batched GPDTW1D emulation returning posterior marginals (M, T) x2.

    Same math as models/gp_dtw.emulate_batch but marginal-only (no full
    covariance materialised) — the fused pipeline consumes marginals only.
    Marginal variance includes the heteroskedastic noise (models.py:220).

    ``gp_init`` optionally warm-starts the hyperparameter optimisation from
    a batched ``GPParams`` (the gridded coarse-to-fine path);
    ``return_params=True`` additionally returns the fitted ``GPParams``
    (for use as a later warm start); ``return_targets=True`` (requires
    ``return_params``) additionally returns the f32 DBA targets
    ``(y_mean, y_var)`` — the pair the f64 refinement passes consume
    (``refine_marginals_f64`` / ``refine_posterior_f64`` ``targets=``) so
    they never re-run the DTW dynamic program.

    ``time_stride > 1`` switches the hyperparameter fit to coarse-to-fine
    IN TIME (ops/gp.fit_gp_batch_warm_time): ``n_optim_nits`` coarse steps
    on every ``time_stride``-th timestep, then ``fine_steps`` (required)
    warm-started steps at full T.  At monthly resolution this is both
    faster AND closer to the converged optimum than the scratch fit
    (measured, benchmarks/monthly_warm_bench.py).  The DBA target and the
    posterior extraction always run at full resolution.
    """
    if return_targets and not return_params:
        # Validate BEFORE the fit: an eager caller must not pay a full
        # multi-second emulation to learn the flag combination is invalid.
        raise ValueError("return_targets requires return_params=True")
    x, y_mean, y_var = gp_ops.prepare_gp_inputs(
        block, mask, dba_iterations=dba_iterations,
        dba_method=dba_method, dba_tol=dba_tol,
    )

    params, _ = gp_ops.fit_gp_batch_dispatch(
        x,
        y_mean,
        y_var,
        kernel_name=kernel_name,
        n_optim_nits=n_optim_nits,
        learning_rate=learning_rate,
        jitter=jitter,
        optimizer=optimizer,
        init=gp_init,
        time_stride=time_stride,
        fine_steps=fine_steps,
    )

    mean, var = gp_ops.posterior_marginals_batch(
        params, x, y_mean, y_var, kernel_name=kernel_name, jitter=jitter
    )
    if return_targets:
        return mean, var + y_var, params, y_mean, y_var
    if return_params:
        return mean, var + y_var, params
    return mean, var + y_var


def chunked_marginals(em, block: jnp.ndarray, mask: jnp.ndarray, chunk: int):
    """Run a jitted ``(block, mask) -> (mean, var)`` emulator ``em`` over a
    merged ``(B, R, T)`` batch in host-pipelined model chunks.

    The HBM-bounding counterpart of :func:`ops.gp.fit_gp_batch_chunked`
    (which bounds execution TIME): a merged native-monthly historical batch
    (7 SSPs x 16 padded models = 112 emulators at T = 1980) needs several
    (B, T, T) f32 gram-sized buffers inside the NLML scan — ~1.76 GB each
    at B = 112 — and a single merged program exhausts the chip's HBM
    (measured: RESOURCE_EXHAUSTED on v5e-16GB).  Chunking the model axis at
    the HOST level keeps ONE compiled program (all chunks share a shape)
    executed ceil(B/chunk) times, bounding peak HBM at the chunk's working
    set; dispatch overhead is a few ms against ~30 s chunk executions.

    When ``B % chunk != 0`` the last chunk is padded with REPLICATED real
    rows (tiled when the pad exceeds the batch, i.e. ``chunk > 2B``) so
    padded lanes run the same well-conditioned math; replica results are
    sliced off before returning.
    """
    if chunk <= 0:
        raise ValueError(f"chunk must be positive, got {chunk}")
    b = block.shape[0]
    g = -(-b // chunk)
    pad = g * chunk - b
    if pad:
        reps = -(-pad // b)
        filler = jnp.concatenate([block] * reps, axis=0)[:pad]
        filler_mask = jnp.concatenate([mask] * reps, axis=0)[:pad]
        block = jnp.concatenate([block, filler], axis=0)
        mask = jnp.concatenate([mask, filler_mask], axis=0)
    means, varis = [], []
    for i in range(g):
        mu, var = em(
            block[i * chunk : (i + 1) * chunk], mask[i * chunk : (i + 1) * chunk]
        )
        means.append(mu)
        varis.append(var)
    return jnp.concatenate(means)[:b], jnp.concatenate(varis)[:b]


def ensemble_scenario_step(
    hist_block: jnp.ndarray,  # (M, R, T_hist)
    hist_mask: jnp.ndarray,  # (M, R)
    ssp_block: jnp.ndarray,  # (M, R, T_ssp)
    ssp_mask: jnp.ndarray,  # (M, R)
    obs: jnp.ndarray,  # (R_obs, T_hist)
    model_mask: tp.Optional[jnp.ndarray] = None,  # (M,) for padded models
    *,
    kernel_name: str = "matern32",
    n_optim_nits: int = 500,
    learning_rate: float = 0.01,
    dba_iterations: int = 10,
    dba_method: str = "classic",
    dba_tol: tp.Optional[float] = None,
    weight_kind: str = "crps",
    optimizer: str = "adam",
    model_axis: tp.Optional[str] = None,
    sigma_mode: str = "w2",
    time_stride: int = 1,
    fine_steps: tp.Optional[int] = None,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One full scenario: emulate hist+ssp, weight vs obs, W2 barycentre.

    ``sigma_mode``: ``"w2"`` (closed-form barycentre sigma, default) or
    ``"mixture"`` (calibrated moment-matched mixture variance; see
    ops.wasserstein.batched_gaussian_barycentre — the reference-compat
    fixed point stays a library-path option only).

    When ``model_axis`` names a live shard_map axis, the cross-model
    couplings (weight normalisation, barycentre sums) become ``psum``s over
    it — the same pattern as ensemble_multi_scenario_step and
    gridded_ensemble_step, so the sharded and unsharded paths share ONE
    body (make_sharded_step wraps this function).

    Returns (bary_mean (T_ssp,), bary_std (T_ssp,), weights (M,)).
    Pure JAX: jit/shard at the call site (see make_sharded_step).
    """
    if sigma_mode not in ("w2", "mixture"):
        raise ValueError(
            f"fused step supports sigma_mode 'w2' | 'mixture', got {sigma_mode!r}"
        )
    em = functools.partial(
        emulate_marginals,
        kernel_name=kernel_name,
        n_optim_nits=n_optim_nits,
        learning_rate=learning_rate,
        dba_iterations=dba_iterations,
        dba_method=dba_method,
        dba_tol=dba_tol,
        optimizer=optimizer,
        time_stride=time_stride,
        fine_steps=fine_steps,
    )
    hist_mean, hist_var = em(hist_block, hist_mask)
    ssp_mean, ssp_var = em(ssp_block, ssp_mask)

    raw = fused_raw_weights(
        weight_kind, hist_mean, hist_var, obs, hist_block, hist_mask, model_mask,
        model_axis=model_axis,
    )
    if model_mask is not None:
        raw = raw * model_mask[:, None]
    # The one cross-model reduction -> psum when the model axis is sharded.
    total = jnp.sum(raw, axis=0, keepdims=True)
    if model_axis is not None:
        total = jax.lax.psum(total, model_axis)
    weights_t = raw / total
    weights = jnp.mean(weights_t, axis=1)  # time-mean, one weight per model

    bary_mean = jnp.sum(weights[:, None] * ssp_mean, axis=0)
    if model_axis is not None:
        bary_mean = jax.lax.psum(bary_mean, model_axis)
    if sigma_mode == "mixture":
        var = jnp.sum(
            weights[:, None]
            * (ssp_var + jnp.square(ssp_mean - bary_mean[None, :])),
            axis=0,
        )
        if model_axis is not None:
            var = jax.lax.psum(var, model_axis)
        bary_std = jnp.sqrt(var)
    else:
        bary_std = jnp.sum(weights[:, None] * jnp.sqrt(ssp_var), axis=0)
        if model_axis is not None:
            bary_std = jax.lax.psum(bary_std, model_axis)
    return bary_mean, bary_std, weights


def ensemble_multi_scenario_step(
    hist_blocks: jnp.ndarray,  # (S, M, R, T_hist)
    hist_masks: jnp.ndarray,  # (S, M, R)
    ssp_blocks: jnp.ndarray,  # (S, M, R, T_ssp)
    ssp_masks: jnp.ndarray,  # (S, M, R)
    obs: jnp.ndarray,  # (R_obs, T_hist)
    model_masks: jnp.ndarray,  # (S, M)
    *,
    kernel_name: str = "matern32",
    n_optim_nits: int = 500,
    learning_rate: float = 0.01,
    dba_iterations: int = 10,
    dba_method: str = "classic",
    dba_tol: tp.Optional[float] = None,
    weight_kind: str = "crps",
    optimizer: str = "adam",
    model_axis: tp.Optional[str] = None,
    sigma_mode: str = "w2",
    time_stride: int = 1,
    fine_steps: tp.Optional[int] = None,
):
    """All scenarios in ONE program by merging the (scenario, model) axes.

    The emulation stage — the compute-dominant 2000-step optimisation scan —
    runs once over the merged ``S*M`` batch (both collections), instead of S
    sequential scenario programs; the per-scenario weighting/barycentre tail
    is cheap elementwise work.  Returns (bary_mean (S, T_ssp), bary_std,
    weights (S, M)).

    When ``model_axis`` names a live shard_map axis, the per-scenario
    cross-model couplings become psums over it (the sharded-bench
    configuration: scenarios batched, models sharded — see
    make_sharded_multi_scenario_step).
    """
    s, m, r, t_hist = hist_blocks.shape
    t_ssp = ssp_blocks.shape[-1]
    em = functools.partial(
        emulate_marginals,
        kernel_name=kernel_name,
        n_optim_nits=n_optim_nits,
        learning_rate=learning_rate,
        dba_iterations=dba_iterations,
        dba_method=dba_method,
        dba_tol=dba_tol,
        optimizer=optimizer,
        time_stride=time_stride,
        fine_steps=fine_steps,
    )
    hist_mean, hist_var = em(
        hist_blocks.reshape(s * m, r, t_hist), hist_masks.reshape(s * m, r)
    )
    ssp_mean, ssp_var = em(
        ssp_blocks.reshape(s * m, r, t_ssp), ssp_masks.reshape(s * m, r)
    )
    return multi_scenario_tail(
        hist_mean.reshape(s, m, t_hist),
        hist_var.reshape(s, m, t_hist),
        ssp_mean.reshape(s, m, t_ssp),
        ssp_var.reshape(s, m, t_ssp),
        obs,
        hist_blocks,
        hist_masks,
        model_masks,
        weight_kind=weight_kind,
        model_axis=model_axis,
        sigma_mode=sigma_mode,
    )


def multi_scenario_tail(
    hist_mean: jnp.ndarray,  # (S, M, T_hist) posterior marginal means
    hist_var: jnp.ndarray,  # (S, M, T_hist)
    ssp_mean: jnp.ndarray,  # (S, M, T_ssp)
    ssp_var: jnp.ndarray,  # (S, M, T_ssp)
    obs: jnp.ndarray,  # (R_obs, T_hist)
    hist_blocks: jnp.ndarray,  # (S, M, R, T_hist) raw realisations
    hist_masks: jnp.ndarray,  # (S, M, R)
    model_masks: jnp.ndarray,  # (S, M)
    *,
    weight_kind: str = "crps",
    model_axis: tp.Optional[str] = None,
    sigma_mode: str = "w2",
):
    """Weighting + barycentre tail of the multi-scenario step, given the
    emulated marginals.

    Split out of ``ensemble_multi_scenario_step`` so callers that must
    stage the emulation differently — e.g. the native-monthly campaign,
    whose merged (S*M, T=1980) historical grams exceed single-chip HBM and
    are emulated in host-pipelined model chunks (benchmarks/monthly_bench
    ``all``) — reuse the exact same cross-model couplings (weight psum,
    barycentre sums) instead of duplicating them.
    """
    raw = jax.vmap(
        functools.partial(fused_raw_weights, weight_kind, model_axis=model_axis),
        in_axes=(0, 0, None, 0, 0, 0),
    )(hist_mean, hist_var, obs, hist_blocks, hist_masks, model_masks)
    raw = raw * model_masks[:, :, None]
    total = jnp.sum(raw, axis=1, keepdims=True)
    if model_axis is not None:
        total = jax.lax.psum(total, model_axis)
    weights_t = raw / total
    weights = jnp.mean(weights_t, axis=2)  # (S, M)

    if sigma_mode not in ("w2", "mixture"):
        raise ValueError(
            f"fused step supports sigma_mode 'w2' | 'mixture', got {sigma_mode!r}"
        )
    bary_mean = jnp.sum(weights[:, :, None] * ssp_mean, axis=1)
    if model_axis is not None:
        bary_mean = jax.lax.psum(bary_mean, model_axis)
    if sigma_mode == "mixture":
        # Needs the GLOBAL mean first (already psum'd above), then one more
        # cross-model reduction for the mixture variance.
        var = jnp.sum(
            weights[:, :, None]
            * (ssp_var + jnp.square(ssp_mean - bary_mean[:, None, :])),
            axis=1,
        )
        if model_axis is not None:
            var = jax.lax.psum(var, model_axis)
        bary_std = jnp.sqrt(var)
    else:
        bary_std = jnp.sum(weights[:, :, None] * jnp.sqrt(ssp_var), axis=1)
        if model_axis is not None:
            bary_std = jax.lax.psum(bary_std, model_axis)
    return bary_mean, bary_std, weights


def refined_multi_scenario_f64(
    hb: jnp.ndarray,  # (S, M, R, T_hist)
    hm: jnp.ndarray,  # (S, M, R)
    sb: jnp.ndarray,  # (S, M, R, T_ssp)
    sm: jnp.ndarray,  # (S, M, R)
    obs: jnp.ndarray,  # (R_obs, T_hist)
    model_masks: jnp.ndarray,  # (S, M)
    hist_params,  # GPParams with leading (S*M,) axis (f32-converged)
    ssp_params,  # GPParams with leading (S*M,) axis
    *,
    kernel_name: str = "matern32",
    dba_iterations: int = 10,
    dba_method: str = "classic",
    dba_tol: tp.Optional[float] = None,
    jitter: float = 1e-6,
    weight_kind: str = "crps",
    sigma_mode: str = "w2",
    targets=None,  # optional ((h_y_mean, h_y_var), (s_y_mean, s_y_var))
    device: tp.Optional[str] = None,
):
    """Float64 posterior refinement at the f32-converged hyperparameters.

    The f32 pipeline's residual error against an f64 recompute at MATCHED
    hyperparameters and DBA targets is the f32 solve scatter at the
    workload's conditioning (~2.3e-4 °C on the real 7-SSP workload,
    BASELINE.md "Matched-hyperparameter parity") — a computation-precision
    floor, not trajectory divergence.  This pass removes that floor for
    the PUBLISHED moments while keeping the fit itself in f32 (where the
    speed is): it re-runs only the posterior extraction and the
    weighting/barycentre tail in float64 on the same device, consuming
    the f32 fit's hyperparameters and its f32 DBA targets unchanged.
    XLA's TPU f64 is emulated but exact; measured cost on the full 7-SSP
    annual workload is ~7.4 s steady (emulated f64 solves run ~2 orders
    slower than f32) — a final-artifact pass, not an inner-loop one.
    Closes BASELINE.json's 1e-5 parity line on the real workload
    (measured 1.1e-12 vs the f64 CPU oracle; bench.py
    ``parity_matched_refined``).

    ``targets``: the fit's own f32 ``((h_y_mean, h_y_var), (s_y_mean,
    s_y_var))`` — bit-identical by construction and skips re-running the
    DBA dynamic program; recomputed through the same jitted preamble when
    omitted.

    ``device="cpu"`` places the f64 pass on the host CPU backend, where
    f64 is native rather than emulated — measured 4.3x faster for the
    7-SSP workload (1.7 s vs 7.4 s steady, BASELINE.md); both are exact.

    Host-level entry point — enables x64 internally; do not call under
    an outer ``jit``.  Returns ``(bary_mean, bary_std, weights)`` as
    float64 numpy arrays.
    """
    s, m, r, t_hist = hb.shape
    t_ssp = sb.shape[-1]
    hx = jnp.swapaxes(hb.reshape(s * m, r, t_hist), 1, 2)
    sx = jnp.swapaxes(sb.reshape(s * m, r, t_ssp), 1, 2)
    if targets is not None:
        (h_ym, h_yv), (s_ym, s_yv) = targets
    else:
        prep = jax.jit(
            functools.partial(
                gp_ops.prepare_gp_inputs,
                dba_iterations=dba_iterations,
                dba_method=dba_method,
                dba_tol=dba_tol,
            )
        )
        # The f32 targets, recomputed through the fit's own preamble.
        _, h_ym, h_yv = prep(
            hb.reshape(s * m, r, t_hist), hm.reshape(s * m, r)
        )
        _, s_ym, s_yv = prep(sb.reshape(s * m, r, t_ssp), sm.reshape(s * m, r))
    hx, h_ym, h_yv, sx, s_ym, s_yv = (
        np.asarray(a) for a in (hx, h_ym, h_yv, sx, s_ym, s_yv)
    )
    hp_np = jax.tree_util.tree_map(np.asarray, hist_params)
    sp_np = jax.tree_util.tree_map(np.asarray, ssp_params)

    import contextlib

    with contextlib.ExitStack() as stack:
        stack.enter_context(jax.enable_x64())
        if device is not None:
            stack.enter_context(jax.default_device(jax.devices(device)[0]))

        def marginals(params_np, x, ym, yv):
            p64 = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64), params_np
            )
            ym64 = jnp.asarray(ym, jnp.float64)
            yv64 = jnp.asarray(yv, jnp.float64)
            mu, var = gp_ops.posterior_marginals_batch(
                p64, jnp.asarray(x, jnp.float64), ym64, yv64,
                kernel_name=kernel_name, jitter=jitter,
            )
            return mu, var + yv64

        h_mu, h_var = jax.jit(marginals)(hp_np, hx, h_ym, h_yv)
        s_mu, s_var = jax.jit(marginals)(sp_np, sx, s_ym, s_yv)
        bm, bs, w = jax.jit(
            functools.partial(
                multi_scenario_tail,
                weight_kind=weight_kind,
                sigma_mode=sigma_mode,
            )
        )(
            h_mu.reshape(s, m, t_hist), h_var.reshape(s, m, t_hist),
            s_mu.reshape(s, m, t_ssp), s_var.reshape(s, m, t_ssp),
            jnp.asarray(np.asarray(obs), jnp.float64),
            jnp.asarray(np.asarray(hb), jnp.float64),
            jnp.asarray(np.asarray(hm), jnp.float64),
            jnp.asarray(np.asarray(model_masks), jnp.float64),
        )
        return (
            np.asarray(bm, np.float64),
            np.asarray(bs, np.float64),
            np.asarray(w, np.float64),
        )


def make_sharded_multi_scenario_step(
    mesh: Mesh,
    model_axis: str = "model",
    *,
    scenario_axis: tp.Optional[str] = None,
    kernel_name: str = "matern32",
    n_optim_nits: int = 500,
    learning_rate: float = 0.01,
    dba_iterations: int = 10,
    dba_method: str = "classic",
    dba_tol: tp.Optional[float] = None,
    weight_kind: str = "crps",
    optimizer: str = "adam",
    sigma_mode: str = "w2",
    time_stride: int = 1,
    fine_steps: tp.Optional[int] = None,
):
    """The headline bench's multi-chip form: ALL scenarios in one program,
    scenario axis batched on every device, model axis sharded over ``mesh``.

    On a v5e-8 each chip fits S x M/8 emulators; the only collectives are
    the per-scenario weight-normalisation psum and barycentre psums.

    When ``scenario_axis`` names a second mesh axis, the scenario dim is
    sharded too (the 2-D ``(scenario, model)`` mesh for pods beyond ~8
    chips).  Scenarios never couple — the reference's pipeline runs them as
    fully independent experiments (full_experiment_script.py:87-143) — so
    the scenario axis is collective-free DP and the psums stay on
    ``model_axis`` only.
    """
    fn = functools.partial(
        ensemble_multi_scenario_step,
        kernel_name=kernel_name,
        n_optim_nits=n_optim_nits,
        learning_rate=learning_rate,
        dba_iterations=dba_iterations,
        dba_method=dba_method,
        dba_tol=dba_tol,
        weight_kind=weight_kind,
        optimizer=optimizer,
        model_axis=model_axis,
        sigma_mode=sigma_mode,
        time_stride=time_stride,
        fine_steps=fine_steps,
    )
    from jax import shard_map

    p_sm = P(scenario_axis, model_axis)
    p_s = P(scenario_axis)
    smapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(p_sm, p_sm, p_sm, p_sm, P(), p_sm),
        out_specs=(p_s, p_s, p_sm),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_sharded_step(
    mesh: Mesh,
    model_axis: str = "model",
    *,
    kernel_name: str = "matern32",
    n_optim_nits: int = 500,
    learning_rate: float = 0.01,
    dba_iterations: int = 10,
    dba_method: str = "classic",
    dba_tol: tp.Optional[float] = None,
    weight_kind: str = "crps",
    optimizer: str = "adam",
    sigma_mode: str = "w2",
    time_stride: int = 1,
    fine_steps: tp.Optional[int] = None,
):
    """One scenario step with the model axis sharded over ``mesh``.

    Built with ``shard_map`` + explicit ``psum`` so each device runs the
    whole fused emulation program (including the Pallas kernels, which stay
    device-local) on its shard of the models; the only collectives are the
    weight-normalisation sum and the barycentre weighted sums — exactly the
    reference's cross-model couplings (weights.py:123,511,
    wasserstein.py:86,98).  Inputs arrive sharded on the leading model dim;
    obs replicated; barycentre outputs replicated, weights sharded.
    """
    if sigma_mode not in ("w2", "mixture"):
        raise ValueError(
            f"fused step supports sigma_mode 'w2' | 'mixture', got {sigma_mode!r}"
        )
    # ONE body for sharded and unsharded: ensemble_scenario_step's
    # model_axis turns its cross-model reductions into psums.
    fn = functools.partial(
        ensemble_scenario_step,
        kernel_name=kernel_name,
        n_optim_nits=n_optim_nits,
        learning_rate=learning_rate,
        dba_iterations=dba_iterations,
        dba_method=dba_method,
        dba_tol=dba_tol,
        weight_kind=weight_kind,
        optimizer=optimizer,
        model_axis=model_axis,
        sigma_mode=sigma_mode,
        time_stride=time_stride,
        fine_steps=fine_steps,
    )

    from jax import shard_map

    p_model = P(model_axis)
    smapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(p_model, p_model, p_model, p_model, P(), p_model),
        out_specs=(P(), P(), p_model),
        check_vma=False,
    )
    return jax.jit(smapped)


def pad_models(
    block: np.ndarray, mask: np.ndarray, m_target: int
) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad the model axis to ``m_target`` (for divisibility by the mesh size).

    Padded entries replicate model 0 (their fit is wasted but numerically
    safe) and are zeroed out of the weights via the returned model_mask.
    """
    m = block.shape[0]
    if m_target < m:
        raise ValueError(f"m_target {m_target} < {m}")
    reps = [block] + [block[:1]] * (m_target - m)
    mreps = [mask] + [mask[:1]] * (m_target - m)
    model_mask = np.concatenate([np.ones(m), np.zeros(m_target - m)]).astype(block.dtype)
    return np.concatenate(reps, 0), np.concatenate(mreps, 0), model_mask
