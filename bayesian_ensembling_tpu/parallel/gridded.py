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

from bayesian_ensembling_tpu.parallel.step import (
    emulate_marginals,
    fused_raw_weights,
)

__all__ = [
    "pad_cells",
    "sharded_gridded_marginals",
    "gridded_ensemble_step",
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

    Returns (bary_mean (C, T), bary_std (C, T), weights (M, C)).
    """
    if sigma_mode not in ("w2", "mixture"):
        raise ValueError(
            f"gridded step supports sigma_mode 'w2' | 'mixture', got {sigma_mode!r}"
        )
    m, c, r, t = block.shape
    if gp_init is not None:
        gp_init = jax.tree.map(lambda p: p.reshape(m * c), gp_init)
    mean, var = emulate_marginals(
        block.reshape(m * c, r, t), mask.reshape(m * c, r),
        gp_init=gp_init, **emulate_kwargs
    )
    mean = mean.reshape(m, c, t)
    var = var.reshape(m, c, t)

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
