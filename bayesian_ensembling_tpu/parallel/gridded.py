"""Mesh-sharded gridded emulation: cells as the data-parallel axis.

The gridded experiment (GPDTW3D batched mode, models/gp_3d.py) is
embarrassingly parallel over grid cells — each (lat, lon) cell fits its own
DBA + heteroskedastic GP.  This module shards the cell axis over a
``jax.sharding.Mesh`` with ``shard_map``: every device runs the fused
emulation program (including the Pallas cholesky path on TPU) on its own
slab of cells, with zero collectives (the only cross-model couplings in the
pipeline live in the weighting/combination stages, parallel/step.py).

This is the BASELINE.md north-star configuration: mesh over a v5e slice,
cells sharded, per-cell pipelines batched on each chip.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bayesian_ensembling_tpu.ops import gp as gp_ops
from bayesian_ensembling_tpu.parallel.step import (
    emulate_marginals,
    fused_raw_weights,
)

__all__ = [
    "pad_cells",
    "sharded_gridded_marginals",
    "gridded_tail",
    "gridded_ensemble_step",
    "refine_marginals_f64",
    "refined_gridded_f64",
    "make_sharded_gridded_step",
    "coarse_cell_indices",
    "coarse_fit_params",
    "coarse_warm_start",
]


def pad_cells(
    block: np.ndarray, mask: np.ndarray, n_devices: int
) -> tp.Tuple[np.ndarray, np.ndarray, int]:
    """Pad the leading cells axis to a multiple of the mesh size.

    Padded cells replicate cell 0 (cheap, numerically safe) — callers slice
    the outputs back to the original count.
    """
    c = block.shape[0]
    target = -(-c // n_devices) * n_devices
    if target == c:
        return block, mask, c
    reps = target - c
    block = np.concatenate([block, np.repeat(block[:1], reps, axis=0)], axis=0)
    mask = np.concatenate([mask, np.repeat(mask[:1], reps, axis=0)], axis=0)
    return block, mask, c


@functools.lru_cache(maxsize=32)
def _sharded_marginals_program(
    mesh: Mesh, axis: str, kwargs_items: tuple, with_init: bool = False
):
    """Build + jit the sharded emulation program ONCE per (mesh, axis,
    kwargs) — constructing shard_map/jit wrappers per call would defeat the
    jit cache and recompile on every invocation.

    ``gp_init`` (array-valued, unhashable) is NEVER part of the cache key:
    when present it is a traced argument of the program, sharded over the
    cells axis like the data."""
    kw = dict(kwargs_items)
    if with_init:
        def fn(b, m, gi):
            return emulate_marginals(b, m, gp_init=gi, **kw)

        in_specs = (P(axis), P(axis), P(axis))
    else:
        fn = functools.partial(emulate_marginals, **kw)
        in_specs = (P(axis), P(axis))
    smapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis), P(axis)),
        # The emulation scans mix device-varying carries with replicated
        # constants; varying-axis checking can't follow that, and the program
        # is collective-free by construction.
        check_vma=False,
    )
    return jax.jit(smapped)


def sharded_gridded_marginals(
    mesh: Mesh,
    block: jnp.ndarray,  # (C, R, T) per-cell realisation stacks
    mask: jnp.ndarray,  # (C, R)
    axis: str = "cells",
    gp_init=None,  # optional (C,)-batched GPParams warm start
    **emulate_kwargs,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Emulate every cell, cells sharded over the mesh; returns (mean, var).

    Uses ``shard_map`` so each device executes the whole fused program
    (DBA wavefront scans + Pallas batched-cholesky GP fits) on its local
    cell slab — the partitioner never has to see inside the kernels.
    ``gp_init`` warm-starts each cell's fit (coarse-to-fine path); its
    leaves shard over the cells axis alongside the data.
    """
    program = _sharded_marginals_program(
        mesh, axis, tuple(sorted(emulate_kwargs.items())), gp_init is not None
    )
    if gp_init is not None:
        return program(block, mask, gp_init)
    return program(block, mask)


def gridded_tail(
    mean: jnp.ndarray,  # (M, C, T) posterior marginal means
    var: jnp.ndarray,  # (M, C, T) marginal variances (incl. noise)
    obs: jnp.ndarray,  # (C, R_obs, T)
    block: jnp.ndarray,  # (M, C, R, T) raw realisations (inverse_square only)
    mask: jnp.ndarray,  # (M, C, R)
    model_mask: tp.Optional[jnp.ndarray] = None,  # (M,)
    *,
    weight_kind: str = "crps",
    sigma_mode: str = "w2",
    model_axis: tp.Optional[str] = None,
):
    """Per-cell weights + W2 barycentre from gridded posterior marginals.

    The weighting/combination tail of ``gridded_ensemble_step``, factored
    out so the f64 refinement (``refined_gridded_f64``) re-runs EXACTLY the
    production tail on its refined marginals — dtype follows the inputs.
    Returns ``(bary_mean (C, T), bary_std (C, T), weights (M, C))``.
    """
    raw = jax.vmap(
        functools.partial(
            fused_raw_weights, weight_kind, model_mask=model_mask,
            model_axis=model_axis,
        ),
        in_axes=(1, 1, 0, 1, 1),
        out_axes=1,
    )(mean, var, obs, block, mask)  # (M, C, T)
    if model_mask is not None:
        raw = raw * model_mask[:, None, None]

    total = jnp.sum(raw, axis=0)  # (C, T)
    if model_axis is not None:
        total = jax.lax.psum(total, model_axis)
    w_t = raw / total
    w = jnp.mean(w_t, axis=2)  # (M, C)

    bary_mean = jnp.sum(w[:, :, None] * mean, axis=0)
    if model_axis is not None:
        bary_mean = jax.lax.psum(bary_mean, model_axis)
    if sigma_mode == "mixture":
        v = jnp.sum(
            w[:, :, None] * (var + jnp.square(mean - bary_mean[None])), axis=0
        )
        if model_axis is not None:
            v = jax.lax.psum(v, model_axis)
        bary_std = jnp.sqrt(v)
    else:
        bary_std = jnp.sum(w[:, :, None] * jnp.sqrt(var), axis=0)
        if model_axis is not None:
            bary_std = jax.lax.psum(bary_std, model_axis)
    return bary_mean, bary_std, w


def gridded_ensemble_step(
    block: jnp.ndarray,  # (M, C, R, T) models x cells realisation stacks
    obs: jnp.ndarray,  # (C, R_obs, T) gridded observations
    mask: jnp.ndarray,  # (M, C, R)
    model_mask: tp.Optional[jnp.ndarray] = None,  # (M,)
    *,
    weight_kind: str = "crps",
    model_axis: tp.Optional[str] = None,
    gp_init=None,  # optional (M, C)-batched GPParams warm start
    sigma_mode: str = "w2",
    return_fit: bool = False,
    **emulate_kwargs,
):
    """Full gridded scenario: emulate -> per-cell weights -> W2 barycentre.

    Pure function of device arrays; jit/shard at the call site.  When
    ``model_axis`` names a live shard_map axis, the two cross-model
    couplings (weight normalisation, barycentre sums) become ``psum``s over
    it — the gridded analogue of parallel/step.py's scenario step.

    ``gp_init`` warm-starts each (model, cell) fit from the given batched
    ``GPParams`` (leading dims (M, C)) — the coarse-to-fine path fits a
    strided coarse grid from scratch and initialises every fine cell from
    its nearest coarse neighbour with far fewer steps (see
    ``coarse_warm_start``).

    Returns ``(bary_mean (C, T), bary_std (C, T), weights (M, C))``; with
    ``return_fit=True`` additionally returns the fitted ``GPParams``
    (leading dims (M, C)) and the f32 DBA targets ``y_mean, y_var``
    ((M, C, T) each) — everything ``refined_gridded_f64`` needs to remove
    the f32 solve scatter from the published moments without re-running
    the fit or the DTW dynamic program.
    """
    if sigma_mode not in ("w2", "mixture"):
        raise ValueError(
            f"gridded step supports sigma_mode 'w2' | 'mixture', got {sigma_mode!r}"
        )
    m, c, r, t = block.shape
    if gp_init is not None:
        gp_init = jax.tree.map(lambda p: p.reshape(m * c), gp_init)
    em = emulate_marginals(
        block.reshape(m * c, r, t), mask.reshape(m * c, r),
        gp_init=gp_init,
        **(
            dict(emulate_kwargs, return_params=True, return_targets=True)
            if return_fit
            else emulate_kwargs
        ),
    )
    if return_fit:
        mean, var, params, y_mean, y_var = em
        params = jax.tree.map(lambda p: p.reshape(m, c), params)
    else:
        mean, var = em
    mean = mean.reshape(m, c, t)
    var = var.reshape(m, c, t)

    out = gridded_tail(
        mean, var, obs, block, mask, model_mask,
        weight_kind=weight_kind, sigma_mode=sigma_mode, model_axis=model_axis,
    )
    if return_fit:
        return out + (params, y_mean.reshape(m, c, t), y_var.reshape(m, c, t))
    return out


def _chunk_bounds(n: int, chunk: tp.Optional[int]):
    """(lo, hi, pad) triples covering ``n`` in equal ``chunk``-sized pieces.

    The ragged final piece is padded (callers repeat leading elements) so
    every piece reuses ONE compiled program — the same trick as the bench's
    slabbed_run."""
    if not chunk or chunk >= n:
        return [(0, n, 0)]
    return [
        (lo, min(lo + chunk, n), chunk - min(lo + chunk, n) + lo)
        for lo in range(0, n, chunk)
    ]


@functools.lru_cache(maxsize=32)
def _refine_marginals_program(kernel_name: str, jitter: float):
    """One jitted f64 marginal-recompute program per (kernel, jitter).

    Cached at module level so the chunked drivers reuse ONE executable per
    chunk shape (a fresh ``jax.jit`` closure per call would recompile every
    chunk); the upcast to f64 happens INSIDE the program so chunks stream
    from f32 host arrays."""

    @jax.jit
    def marginals(p, x_, ym, yv):
        p64 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), p)
        ym64 = jnp.asarray(ym, jnp.float64)
        yv64 = jnp.asarray(yv, jnp.float64)
        mu, var = gp_ops.posterior_marginals_batch(
            p64, jnp.asarray(x_, jnp.float64), ym64, yv64,
            kernel_name=kernel_name, jitter=jitter,
        )
        return mu, var + yv64

    return marginals


def refine_marginals_f64(
    block,  # (N, R, T) realisation stacks (any flat batch)
    mask,  # (N, R)
    params,  # GPParams with leading (N,) axis, f32-converged
    targets,  # (y_mean (N, T), y_var (N, T)) — the fit's own f32 targets
    *,
    kernel_name: str = "matern32",
    jitter: float = 1e-6,
    device: tp.Optional[str] = None,
    chunk: tp.Optional[int] = None,
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Float64 posterior-marginal recompute at f32-converged hyperparameters.

    The marginal-only twin of ``models/gp_dtw.refine_posterior_f64`` for
    batched/gridded surfaces: keeps the fit in f32 (where the speed is),
    re-runs only the posterior extraction — gram, Cholesky, solves — in
    float64 with the f32 fit's hyperparameters and DBA targets unchanged.
    Removes the f32 solve scatter from the published moments (the annual
    surface measured it at ~2e-4 °C; the refined moments agree with an
    independent f64 CPU recompute to ~1e-12, BASELINE.md).

    ``chunk`` bounds the f64 working set (gram is N·T²·8 bytes): the batch
    is processed in equal ``chunk``-sized pieces through one compiled
    program (ragged tail padded).  ``device="cpu"`` places the pass on the
    host CPU backend where f64 is native rather than emulated (measured
    4.3× faster on the annual workload; both are exact).

    Host-level entry point — enables x64 internally; do not call under an
    outer ``jit``.  Returns ``(mean (N, T), var (N, T))`` float64 numpy,
    variance INCLUDING the heteroskedastic noise (the
    ``emulate_marginals`` contract).
    """
    import contextlib

    y_mean, y_var = targets
    n = np.shape(block)[0]
    # Host-side zero-copy transpose — same layout prepare_gp_inputs derives
    # (x = swapaxes(block, 1, 2)).  A jnp.swapaxes here would round-trip
    # the WHOLE block through the default accelerator before the device
    # context is even entered (review finding, round 5: at 0.25° that is
    # 21 GB through the tunnelled link purely for a transpose).
    x = np.swapaxes(np.asarray(block), 1, 2)
    y_mean, y_var = np.asarray(y_mean), np.asarray(y_var)
    del mask  # masked realisations already folded into the f32 targets
    p_np = jax.tree_util.tree_map(np.asarray, params)

    with contextlib.ExitStack() as stack:
        stack.enter_context(jax.enable_x64())
        if device is not None:
            stack.enter_context(jax.default_device(jax.devices(device)[0]))
        marginals = _refine_marginals_program(kernel_name, jitter)
        means, vars_ = [], []
        for lo, hi, pad in _chunk_bounds(n, chunk):
            sl = (
                lambda a: np.concatenate([a[lo:hi], a[:pad]], axis=0)
                if pad
                else a[lo:hi]
            )
            mu, var = marginals(
                jax.tree_util.tree_map(sl, p_np), sl(x), sl(y_mean), sl(y_var)
            )
            mu, var = np.asarray(mu, np.float64), np.asarray(var, np.float64)
            if pad:
                mu, var = mu[: hi - lo], var[: hi - lo]
            means.append(mu)
            vars_.append(var)
    return np.concatenate(means), np.concatenate(vars_)


@functools.lru_cache(maxsize=32)
def _refine_tail_program(weight_kind: str, sigma_mode: str):
    """One jitted tail program per (weighter, sigma mode) — see
    ``_refine_marginals_program`` for why."""
    return jax.jit(
        functools.partial(
            gridded_tail, weight_kind=weight_kind, sigma_mode=sigma_mode
        )
    )


def refined_gridded_f64(
    block,  # (M, C, R, T)
    obs,  # (C, R_obs, T)
    mask,  # (M, C, R)
    params,  # GPParams with leading (M, C) dims, f32-converged
    targets,  # (y_mean (M, C, T), y_var (M, C, T))
    *,
    model_mask: tp.Optional[np.ndarray] = None,
    weight_kind: str = "crps",
    sigma_mode: str = "w2",
    kernel_name: str = "matern32",
    jitter: float = 1e-6,
    device: tp.Optional[str] = None,
    cell_chunk: tp.Optional[int] = None,
) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Float64 refinement of the WHOLE gridded step at f32 hyperparameters.

    The gridded twin of ``parallel/step.refined_multi_scenario_f64``
    (VERDICT r4: the gridded artifacts were the last surface still carrying
    f32 solve scatter): recomputes the posterior marginals in float64 via
    ``refine_marginals_f64`` and then re-runs the production
    weighting/barycentre tail (``gridded_tail``) in float64.  Everything is
    per-cell independent, so ``cell_chunk`` bounds the f64 working set and
    the pass streams cell chunks through one compiled program.

    Host-level entry point.  Returns float64 numpy
    ``(bary_mean (C, T), bary_std (C, T), weights (M, C))``.
    """
    import contextlib

    m, c, r, t = np.shape(block)
    block = np.asarray(block)
    obs = np.asarray(obs)
    mask = np.asarray(mask)
    y_mean, y_var = (np.asarray(a) for a in targets)
    p_np = jax.tree_util.tree_map(np.asarray, params)

    bms, bss, ws = [], [], []
    with contextlib.ExitStack() as stack:
        stack.enter_context(jax.enable_x64())
        if device is not None:
            stack.enter_context(jax.default_device(jax.devices(device)[0]))
        tail = _refine_tail_program(weight_kind, sigma_mode)
        mm64 = (
            jnp.asarray(model_mask, jnp.float64)
            if model_mask is not None
            else None
        )
        for lo, hi, pad in _chunk_bounds(c, cell_chunk):
            sl = (
                lambda a: np.concatenate([a[:, lo:hi], a[:, :pad]], axis=1)
                if pad
                else a[:, lo:hi]
            )
            nc = hi - lo + pad
            mu, var = refine_marginals_f64(
                sl(block).reshape(m * nc, r, t),
                sl(mask).reshape(m * nc, r),
                jax.tree_util.tree_map(
                    lambda p: sl(p).reshape(m * nc), p_np
                ),
                (sl(y_mean).reshape(m * nc, t), sl(y_var).reshape(m * nc, t)),
                kernel_name=kernel_name,
                jitter=jitter,
                device=device,
            )
            osl = (
                np.concatenate([obs[lo:hi], obs[:pad]], axis=0)
                if pad
                else obs[lo:hi]
            )
            bm, bs, w = tail(
                jnp.asarray(mu.reshape(m, nc, t)),
                jnp.asarray(var.reshape(m, nc, t)),
                jnp.asarray(osl, jnp.float64),
                jnp.asarray(sl(block), jnp.float64),
                jnp.asarray(sl(mask)),
                mm64,
            )
            bm, bs, w = (np.asarray(a, np.float64) for a in (bm, bs, w))
            if pad:
                bm, bs, w = bm[: hi - lo], bs[: hi - lo], w[:, : hi - lo]
            bms.append(bm)
            bss.append(bs)
            ws.append(w)
    return (
        np.concatenate(bms),
        np.concatenate(bss),
        np.concatenate(ws, axis=1),
    )


def coarse_cell_indices(
    lat: int, lon: int, stride: int
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Strided coarse subset of a row-major (lat, lon) cell grid.

    Returns ``(coarse, nearest)``: ``coarse`` is the flat cell indices of
    every ``stride``-th row/column; ``nearest[c]`` maps each fine cell to
    the index *within the coarse subset* of its nearest coarse cell.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    rows = np.arange(0, lat, stride)
    cols = np.arange(0, lon, stride)
    coarse = (rows[:, None] * lon + cols[None, :]).ravel()
    ri = np.clip(np.round(np.arange(lat) / stride).astype(int), 0, len(rows) - 1)
    ci = np.clip(np.round(np.arange(lon) / stride).astype(int), 0, len(cols) - 1)
    nearest = (ri[:, None] * len(cols) + ci[None, :]).ravel()
    return coarse, nearest


def coarse_warm_start(
    block: jnp.ndarray,  # (M, C, R, T)
    mask: jnp.ndarray,  # (M, C, R)
    lat: int,
    lon: int,
    stride: int,
    *,
    n_optim_nits: int = 500,
    mesh: tp.Optional[Mesh] = None,
    cells_axis: str = "cells",
    **emulate_kwargs,
):
    """Coarse-to-fine warm start for the gridded experiment (VERDICT r2
    item 3).

    Fits the strided coarse grid (``stride^2``-fold fewer cells) from
    scratch at the full step count, then broadcasts each coarse cell's
    converged hyperparameters to its nearest fine neighbours.  Neighbouring
    cells have near-identical optima, so the fine pass
    (``gridded_ensemble_step(..., gp_init=...)``) needs a fraction of the
    scratch step count to converge — the dominant cost of the 1-degree
    global run was 500 cold-start Adam steps per cell (BASELINE.md).

    With ``mesh`` the coarse fit itself shards its (model x coarse-cell)
    axis over ``cells_axis`` (padded to the mesh size, padding sliced off);
    otherwise it runs on the default device.

    Returns a batched ``GPParams`` with leading dims ``(M, C)`` aligned
    with ``block``'s cell axis, ready to pass as ``gp_init``.
    """
    m, c, r, t = block.shape
    if c != lat * lon:
        raise ValueError(f"cells {c} != lat*lon {lat * lon}")
    coarse, nearest = coarse_cell_indices(lat, lon, stride)
    cb = block[:, coarse].reshape(m * coarse.size, r, t)
    cm = mask[:, coarse].reshape(m * coarse.size, r)
    params = coarse_fit_params(
        cb, cm, n_optim_nits=n_optim_nits, mesh=mesh, cells_axis=cells_axis,
        **emulate_kwargs,
    )
    params = jax.tree.map(lambda p: p.reshape(m, coarse.size), params)
    return jax.tree.map(lambda p: p[:, nearest], params)


def coarse_fit_params(
    cb: jnp.ndarray,  # (N, R, T) stacked coarse-cell realisations
    cm: jnp.ndarray,  # (N, R)
    *,
    n_optim_nits: int = 500,
    mesh: tp.Optional[Mesh] = None,
    cells_axis: str = "cells",
    **emulate_kwargs,
):
    """Scratch-fit hyperparameters for a stack of coarse cells.

    The shared lower half of the coarse-to-fine path: ``coarse_warm_start``
    and external callers that materialise their own coarse subsets (e.g.
    the benchmark's CPU float64 oracle fits only the coarse cells its
    fine subset needs) both get the fit-kwargs construction and the
    (optional) cells-sharded program from ONE place.  Returns batched
    ``GPParams`` with leading dim N.
    """
    kwargs_items = tuple(
        sorted({"n_optim_nits": n_optim_nits, **emulate_kwargs}.items())
    )
    if mesh is None:
        return _warm_fit_program(kwargs_items)(cb, cm)
    n = cb.shape[0]
    n_dev = mesh.shape[cells_axis]
    target = -(-n // n_dev) * n_dev
    if target != n:
        reps = target - n
        cb = jnp.concatenate([cb, jnp.repeat(cb[:1], reps, axis=0)], axis=0)
        cm = jnp.concatenate([cm, jnp.repeat(cm[:1], reps, axis=0)], axis=0)
    params = _sharded_warm_fit_program(mesh, cells_axis, kwargs_items)(cb, cm)
    if target != n:
        params = jax.tree.map(lambda p: p[:n], params)
    return params


@functools.lru_cache(maxsize=32)
def _warm_fit_program(kwargs_items: tuple):
    """One jitted coarse-fit program per kwargs set.

    The emulation pipeline must run under a single ``jit``: executed
    eagerly, the glue ops between the jitted kernels become thousands of
    per-op dispatches (~3 ms each over the tunnelled backend — measured
    9.4 s eager vs 0.33 s jitted for the 5-degree coarse pass)."""
    kw = dict(kwargs_items)

    def fit_params(cb, cm):
        _, _, params = emulate_marginals(cb, cm, return_params=True, **kw)
        return params

    return jax.jit(fit_params)


@functools.lru_cache(maxsize=32)
def _sharded_warm_fit_program(mesh: Mesh, axis: str, kwargs_items: tuple):
    """Cells-sharded twin of ``_warm_fit_program`` (collective-free)."""
    kw = dict(kwargs_items)

    def fit_params(cb, cm):
        _, _, params = emulate_marginals(cb, cm, return_params=True, **kw)
        return params

    smapped = shard_map(
        fit_params,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_sharded_gridded_step(
    mesh: Mesh,
    model_axis: str = "model",
    cells_axis: str = "cells",
    *,
    weight_kind: str = "crps",
    with_gp_init: bool = False,
    **emulate_kwargs,
):
    """The 2-D-mesh gridded step: cells x models sharded simultaneously.

    SURVEY §5.8's mesh sketch ``('cells', 'models')`` realised: the cells
    axis is collective-free data parallelism; the model axis couples only
    at the weight normalisation and barycentre sums (psum over
    ``model_axis``, riding ICI).  Inputs arrive sharded on (model, cells);
    barycentre outputs are replicated over models and sharded over cells.

    With ``with_gp_init=True`` the returned step takes a fifth argument —
    a batched ``GPParams`` warm start with leading dims (M, C), sharded on
    both mesh axes like the data (the coarse-to-fine path,
    ``coarse_warm_start``).
    """
    p_mc = P(model_axis, cells_axis)
    if with_gp_init:
        def fn(block, obs, mask, model_mask, gp_init):
            return gridded_ensemble_step(
                block, obs, mask, model_mask,
                weight_kind=weight_kind, model_axis=model_axis,
                gp_init=gp_init, **emulate_kwargs,
            )

        in_specs = (p_mc, P(cells_axis), p_mc, P(model_axis), p_mc)
    else:
        fn = functools.partial(
            gridded_ensemble_step,
            weight_kind=weight_kind,
            model_axis=model_axis,
            **emulate_kwargs,
        )
        in_specs = (p_mc, P(cells_axis), p_mc, P(model_axis))
    smapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(cells_axis), P(cells_axis), p_mc),
        check_vma=False,
    )
    return jax.jit(smapped)
