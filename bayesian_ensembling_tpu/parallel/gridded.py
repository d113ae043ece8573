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

from bayesian_ensembling_tpu.parallel.step import emulate_marginals

__all__ = ["pad_cells", "sharded_gridded_marginals"]


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


def sharded_gridded_marginals(
    mesh: Mesh,
    block: jnp.ndarray,  # (C, R, T) per-cell realisation stacks
    mask: jnp.ndarray,  # (C, R)
    axis: str = "cells",
    **emulate_kwargs,
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Emulate every cell, cells sharded over the mesh; returns (mean, var).

    Uses ``shard_map`` so each device executes the whole fused program
    (DBA wavefront scans + Pallas batched-cholesky GP fits) on its local
    cell slab — the partitioner never has to see inside the kernels.
    """
    fn = functools.partial(emulate_marginals, **emulate_kwargs)
    smapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        # The emulation scans mix device-varying carries with replicated
        # constants; varying-axis checking can't follow that, and the program
        # is collective-free by construction.
        check_vma=False,
    )
    return jax.jit(smapped)(block, mask)
