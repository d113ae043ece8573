"""Pallas TPU kernel for the DTW wavefront dynamic program.

The squared-DTW cost DP is this project's "ring-attention analogue"
(SURVEY §5.7): O(T^2) work with an anti-diagonal dependency chain.  The
lax.scan formulation (ops/dtw.py) pays XLA loop overhead per diagonal; this
kernel runs the whole 2T-1-step wavefront *inside* one Pallas program with
the alignment-problem batch in the lane dimension, processed in grid chunks
whose HBM<->VMEM transfers Pallas pipelines automatically.

Layout: problems (N) in lanes, time (T) in sublanes.  Per step the three
predecessor diagonals are combined with masked min/rolls — pure VPU work on
a (T, NL) tile.  Used for the all-pairs cost matrices of the medoid
initialisation (`ops.dtw.dtw_pairwise_sq` routes here on TPU); the DBA
update keeps the scan path, whose backward on-path sweep needs the stored
move codes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

__all__ = ["squared_dtw_cost_batch"]

_BIG = 3.0e38  # large finite sentinel; inf arithmetic is slower on the VPU


def _make_dtw_cost_kernel(t: int):
    """Kernel over (Tp, NL) buffers; ``t`` is the true series length
    (buffers are padded to 8-aligned sublanes for tpu.dynamic_rotate)."""

    def kernel(center_ref, series_rev_ref, out_ref, prev2, prev1):
        tp_ = center_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tp_, 1), 0)
        center = center_ref[...]
        series_rev = series_rev_ref[...]

        def diag_series(k):
            # out[i] = s[k-i] = rev[i + t-1-k]: cyclic shift (k-t+1) mod Tp;
            # wraparound only reaches invalid (masked) slots.
            return pltpu.roll(series_rev, (k - t + 1) % tp_, axis=0)

        d0_val = jnp.square(center - diag_series(0))
        prev1[...] = jnp.where(rows == 0, d0_val, _BIG)
        prev2[...] = jnp.full_like(prev1, _BIG)

        def body(k, _):
            valid = (rows <= k) & (rows >= k - (t - 1)) & (rows < t)
            delta = jnp.square(center - diag_series(k))
            p1 = prev1[...]
            p2 = prev2[...]
            left = p1
            top = jnp.where(rows > 0, pltpu.roll(p1, 1, axis=0), _BIG)
            diag = jnp.where(rows > 0, pltpu.roll(p2, 1, axis=0), _BIG)
            best = jnp.minimum(diag, jnp.minimum(left, top))
            cur = jnp.where(valid, jnp.minimum(best + delta, _BIG), _BIG)
            prev2[...] = p1
            prev1[...] = cur
            return 0

        jax.lax.fori_loop(1, 2 * t - 1, body, 0)
        out_ref[...] = prev1[t - 1][None, :]

    return kernel


def squared_dtw_cost_batch(centers: jnp.ndarray, series: jnp.ndarray, lanes: int = 2048) -> jnp.ndarray:
    """Squared-DTW cost for a batch of equal-length alignment problems.

    Args:
      centers, series: ``(N, T)`` problem pairs.
      lanes: problems per grid chunk (VMEM: ~5 (T, lanes) f32 buffers).

    Returns:
      ``(N,)`` alignment costs, identical to ``ops.dtw.squared_dtw`` per pair.
    """
    n, t = centers.shape
    t_pad = -(-t // 8) * 8  # dynamic_rotate needs 8-aligned sublanes
    lanes = min(lanes, max(-(-n // 128) * 128, 128))
    n_pad = -(-n // lanes) * lanes
    c = jnp.pad(centers, ((0, n_pad - n), (0, t_pad - t))).T  # (Tp, N_pad)
    s_rev = jnp.pad(series[:, ::-1], ((0, n_pad - n), (0, t_pad - t))).T

    grid = (n_pad // lanes,)
    out = pl.pallas_call(
        _make_dtw_cost_kernel(t),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), centers.dtype),
        in_specs=[
            pl.BlockSpec((t_pad, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t_pad, lanes), centers.dtype),
            pltpu.VMEM((t_pad, lanes), centers.dtype),
        ],
        interpret=INTERPRET,
    )(c, s_rev)
    return out[0, :n]
