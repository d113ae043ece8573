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

import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

__all__ = ["squared_dtw_cost_batch", "dba_update_batch"]

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


# Scoped-VMEM allowance used for lane sizing AND the fused/split dispatch
# gates — ONE shared constant (ops/vmem.py) so the chunk chosen always
# satisfies the gate that admitted the kernel (a looser sizing budget would
# pick lane widths the gate's own arithmetic rejects at mid-range T).
from bayesian_ensembling_tpu.ops import vmem as _vmem

_SCOPED_VMEM_BUDGET = _vmem.SCOPED_VMEM_BUDGET  # ~15.5 MiB of the 16 MiB limit


def _lanes_for(
    t_pad: int,
    bytes_per_elem: int,
    requested: int,
    n: int,
    budget: int = _SCOPED_VMEM_BUDGET,
) -> int:
    """Largest 128-multiple lane chunk whose (T_pad, lanes) working set fits
    the VMEM budget — annual workloads (T ~ 165) keep the wide defaults,
    monthly resolutions (T ~ 1032) shrink the chunk instead of
    overflowing VMEM."""
    return _vmem.max_lane_chunk(
        t_pad * bytes_per_elem, budget, requested=requested, n=n
    )


# Measured scoped-VMEM footprint of the fused DBA kernel: ~76 B per
# (row, lane) element (in/out f32 buffers + forward and backward loop
# carries + int8 staging), against the 16 MB scoped limit.  Annual T=165 at
# 1024 lanes = 14.9 MB (fits, the production config); monthly SSP T=1032 at
# the 128-lane minimum = 10.3 MB (fits); monthly historical T=1980 = 19.3 MB
# (cannot fit at any lane width) -> the SPLIT kernel pair takes over, whose
# phases each hold roughly half the working set.
_DBA_BYTES_PER_ELEM = 76
_DBA_SPLIT_BYTES_PER_ELEM = 44  # max over the fwd / bwd phase kernels
# Cost-only wavefront kernel.  The static buffers are 6 f32 per (row, lane)
# element — the two VMEM inputs are DOUBLE-BUFFERED by Pallas's grid
# pipelining whenever the batch spans more than one lane chunk (2 x 2) plus
# the two loop-carry scratch diagonals — and Mosaic's stack allocation for
# the roll/select temporaries adds more.  The stack term is NOT a constant;
# the hardware catalogue that shaped this model: 34.0 B/elem at
# (T=1980, 256 lanes) (a 24 B/elem model admitted chunks there that
# exceeded the scoped limit by 480 KB), 49.1 B/elem at T=3000 AND T=3500
# (128 lanes — a 36 B model OOM'd by 2.0-4.9 MB; round-3 boundary sweep),
# and 49.4 B/elem at (T=1032, 384 lanes, grid=2) (round 4: a two-regime
# model with a 36 B constant below t_pad 1984 admitted 384 lanes inside
# the subgradient-DBA epoch loop and Mosaic demanded 18.67 MiB — the
# growth is not confined to T > 2000).  One conservative multi-chunk
# constant (50 B, >= every measured point) now covers ALL t_pad: every
# dispatch boundary is unchanged (the gate at the 128-lane minimum still
# flips between t_pad 2536 and 2544), only lane widths at monthly T
# shrink (e.g. T=1032: 384 -> 256), and annual widths are governed by the
# caller's request/batch caps anyway.
_DTW_COST_BYTES_PER_ELEM = 50
# Single-chunk (grid == 1) cost: no grid pipelining means the two inputs are
# not double-buffered — measured 41.4 B/elem at T=4528.  42 B covers it;
# consulted when the multi-chunk gate fails, raising the ceiling for
# batches that fit ONE chunk (N <= 128 at T up to ~3000 on v5e vs ~2500
# multi-chunk).
_DTW_COST_BYTES_PER_ELEM_SINGLE = 42


def _dtw_cost_bytes_per_elem(t_pad: int) -> int:
    return _DTW_COST_BYTES_PER_ELEM


def dtw_cost_fits(t: int, n: tp.Optional[int] = None) -> bool:
    """Whether ``squared_dtw_cost_batch`` fits scoped VMEM at T — at the
    minimum 128-lane chunk (T up to ~2500 on v5e), or, when the batch size
    ``n`` is given and fits a SINGLE chunk, at the cheaper grid-1 cost model
    (no double-buffered inputs; T up to ~3000 at n <= 128).  Beyond both,
    callers must use the lax.scan wavefront path (ops/dtw.py)."""
    t_pad = -(-t // 8) * 8
    if _vmem.fits_min_chunk(
        t_pad * _dtw_cost_bytes_per_elem(t_pad), _SCOPED_VMEM_BUDGET
    ):
        return True
    return n is not None and _single_chunk_lanes(t_pad, n) is not None


def _single_chunk_lanes(t_pad: int, n: int) -> tp.Optional[int]:
    """Lane width for a grid-1 rescue dispatch (whole batch in one chunk at
    the un-double-buffered cost model), or None if that does not fit."""
    q = _vmem.LANE_QUANTUM
    n_pad = max(-(-n // q) * q, q)
    if n_pad * t_pad * _DTW_COST_BYTES_PER_ELEM_SINGLE <= _SCOPED_VMEM_BUDGET:
        return n_pad
    return None


def fused_dba_fits(t: int) -> bool:
    """Whether the single fused DBA-update kernel fits scoped VMEM at T (at
    the minimum 128-lane chunk).  Beyond it ``dba_update_batch`` runs the
    forward DP and the backward on-path sweep as two Pallas programs
    (``split_dba_fits``); beyond THAT ceiling callers must use the lax.scan
    wavefront path (ops/dtw.py), which has no VMEM residency."""
    tp_ = -(-t // 32) * 32
    return _vmem.fits_min_chunk(tp_ * _DBA_BYTES_PER_ELEM, _SCOPED_VMEM_BUDGET)


def split_dba_fits(t: int) -> bool:
    """Whether the two-program (fwd / bwd) DBA update fits scoped VMEM at T
    — covers the native monthly historical resolution (T = 1980) and up to
    T ~ 2800."""
    tp_ = -(-t // 32) * 32
    return _vmem.fits_min_chunk(tp_ * _DBA_SPLIT_BYTES_PER_ELEM, _SCOPED_VMEM_BUDGET)


def squared_dtw_cost_batch(centers: jnp.ndarray, series: jnp.ndarray, lanes: int = 2048) -> jnp.ndarray:
    """Squared-DTW cost for a batch of equal-length alignment problems.

    Args:
      centers, series: ``(N, T)`` problem pairs.
      lanes: problems per grid chunk (VMEM: ``_dtw_cost_bytes_per_elem``
        bytes per (T, lane) element — measured with grid double-buffering
        in two T regimes; see the constants' comment).

    Returns:
      ``(N,)`` alignment costs, identical to ``ops.dtw.squared_dtw`` per pair.
    """
    n, t = centers.shape
    t_pad = -(-t // 8) * 8  # dynamic_rotate needs 8-aligned sublanes
    bpe = _dtw_cost_bytes_per_elem(t_pad)
    if _vmem.fits_min_chunk(t_pad * bpe, _SCOPED_VMEM_BUDGET):
        lanes = _lanes_for(t_pad, bpe, lanes, n)
    else:
        # Grid-1 rescue: past the multi-chunk ceiling a batch that fits ONE
        # chunk still runs (no grid pipelining => no input double-buffering,
        # the cheaper _SINGLE cost model).  Overrides the ``lanes``
        # preference — a single wide chunk is the only admissible layout.
        single = _single_chunk_lanes(t_pad, n)
        if single is None:
            raise ValueError(
                f"T={t} (batch {n}) exceeds the DTW cost kernel's scoped-VMEM "
                "ceiling at every admissible chunk layout; use the lax.scan "
                "wavefront path (ops.dtw.squared_dtw / dtw_pairwise_sq "
                "dispatch there automatically for such T)"
            )
        lanes = single
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


# ------------------------------------------------------- fused DBA update
#
# The DBA update = a forward wavefront DP emitting move-code rows to HBM
# (0=diag, 1=left, 2=top; reference tie-break dtwa.py:113-126) + a backward
# on-path sweep reading them back (a cell is on the path iff a successor
# chose it), with the series diagonal maintained by static roll-by-1 per
# step.  The two pass bodies below are SHARED by the single fused program
# (small T) and the split fwd/bwd program pair (large T) so the DP
# semantics, tie-break, and DMA double-buffer protocol live in one place.


def _dba_forward_pass(t, center, series_rev, rows, mv_buf, wr_dma):
    """2T-2 wavefront steps; each emits a (Tp, L) int8 move row through the
    double-buffered ``mv_buf`` slot via ``wr_dma`` (the full (2T-1, Tp, L)
    code tensor exceeds VMEM).  Returns the final series diagonal."""
    tp_ = rows.shape[0]
    # sdiag holds s[k-i] at slot i for the current diagonal k; advancing
    # k rolls it by one (init: diagonal 0 = roll by (1-t) mod Tp).
    sdiag0 = pltpu.roll(series_rev, (1 - t) % tp_, axis=0)
    d0 = jnp.where(rows == 0, jnp.square(center - sdiag0), _BIG)
    # Derive from d0 so the init layout matches the loop body's
    # (a constant splat is lane-replicated and Mosaic refuses the
    # replicated->non-replicated carry relayout).
    prev2_0 = d0 * 0.0 + _BIG

    def fwd(k, carry):
        prev2, prev1, sdiag = carry
        sdiag = pltpu.roll(sdiag, 1, axis=0)
        valid = (rows <= k) & (rows >= k - (t - 1)) & (rows < t)
        delta = jnp.square(center - sdiag)
        left = prev1
        top = jnp.where(rows > 0, pltpu.roll(prev1, 1, axis=0), _BIG)
        diag = jnp.where(rows > 0, pltpu.roll(prev2, 1, axis=0), _BIG)
        # Reference tie-break: diag, then left, then top (dtwa.py:113-126).
        take_diag = (diag <= left) & (diag <= top)
        take_left = ~take_diag & (left <= top)
        best = jnp.where(take_diag, diag, jnp.where(take_left, left, top))
        move = jnp.where(take_diag, 0, jnp.where(take_left, 1, 2)).astype(jnp.int8)
        cur = jnp.where(valid, jnp.minimum(best + delta, _BIG), _BIG)

        slot = k % 2

        @pl.when(k >= 3)
        def _():
            wr_dma(slot, k - 2).wait()

        mv_buf[slot] = move
        wr_dma(slot, k).start()
        return (prev1, cur, sdiag)

    _, _, sdiag_last = jax.lax.fori_loop(1, 2 * t - 1, fwd, (prev2_0, d0, sdiag0))
    wr_dma((2 * t - 2) % 2, 2 * t - 2).wait()
    wr_dma((2 * t - 3) % 2, 2 * t - 3).wait()
    return sdiag_last


def _dba_backward_pass(t, sdiag_last, rows, sums_ref, counts_ref, rd_buf, rd_dma):
    """Backward on-path sweep: move rows are prefetched one step ahead via
    ``rd_dma``; aligned-value sums and visit counts accumulate directly into
    the output refs (no extra loop carries)."""
    tp_ = rows.shape[0]
    dtype = sdiag_last.dtype
    # Start at the corner diagonal k = 2T-2 (always on the path);
    # prefetching its move row is not needed separately — it is consumed at
    # the first step below as "moves_k1".
    rd_dma((2 * t - 2) % 2, 2 * t - 2).start()

    # Round-trip the inits through the output refs so every loop carry
    # starts with a concrete (non-replicated) VMEM layout.
    counts_ref[...] = jnp.where(rows == t - 1, 1.0, 0.0) + sdiag_last * 0.0
    on_k1_0 = counts_ref[...]
    sums_ref[...] = jnp.where(rows == t - 1, sdiag_last, 0.0)
    zeros = on_k1_0 * 0.0

    def shift_up(x):
        # roll by Tp-1 == roll by -1 (pltpu.roll needs non-negative shifts)
        return jnp.where(rows < tp_ - 1, pltpu.roll(x, tp_ - 1, axis=0), 0.0)

    def bwd(step, carry):
        on_k1, on_k2, movesf_k2, sdiag = carry
        k = 2 * t - 3 - step
        sdiag = pltpu.roll(sdiag, tp_ - 1, axis=0)

        slot = (k + 1) % 2
        rd_dma(slot, k + 1).wait()
        movesf_k1 = rd_buf[slot].astype(dtype)

        @pl.when(k >= 1)
        def _():
            rd_dma(k % 2, k).start()

        diag_t = shift_up(on_k2 * jnp.where(movesf_k2 == 0, 1.0, 0.0))
        left_t = on_k1 * jnp.where(movesf_k1 == 1, 1.0, 0.0)
        top_t = shift_up(on_k1 * jnp.where(movesf_k1 == 2, 1.0, 0.0))
        valid = ((rows <= k) & (rows >= k - (t - 1)) & (rows < t)).astype(dtype)
        on_k = jnp.minimum(diag_t + left_t + top_t, 1.0) * valid
        sums_ref[...] = sums_ref[...] + on_k * sdiag
        counts_ref[...] = counts_ref[...] + on_k
        return (on_k, on_k1, movesf_k1, sdiag)

    jax.lax.fori_loop(0, 2 * t - 2, bwd, (on_k1_0, zeros, zeros, sdiag_last))


def _make_dba_update_kernel(t: int):
    """Both DBA passes in ONE Pallas program per lane chunk (semantics of
    reference dtwa.py:48-143, structured like ops/dtw.py's scan pair but
    without XLA per-diagonal loop overhead)."""

    def kernel(
        center_ref,  # (Tp, L) VMEM
        series_rev_ref,  # (Tp, L) VMEM
        sums_ref,  # (Tp, L) VMEM out
        counts_ref,  # (Tp, L) VMEM out
        moves_hbm,  # (2T-1, Tp, L) int8 ANY out (scratch shared by chunks)
        mv_buf,  # (2, Tp, L) int8 VMEM scratch (forward staging)
        rd_buf,  # (2, Tp, L) int8 VMEM scratch (backward prefetch)
        w_sems,  # DMA sems (2,)
        r_sems,  # DMA sems (2,)
    ):
        tp_ = center_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tp_, 1), 0)

        def wr_dma(slot, k):
            return pltpu.make_async_copy(mv_buf.at[slot], moves_hbm.at[k], w_sems.at[slot])

        def rd_dma(slot, k):
            return pltpu.make_async_copy(moves_hbm.at[k], rd_buf.at[slot], r_sems.at[slot])

        sdiag_last = _dba_forward_pass(
            t, center_ref[...], series_rev_ref[...], rows, mv_buf, wr_dma
        )
        _dba_backward_pass(t, sdiag_last, rows, sums_ref, counts_ref, rd_buf, rd_dma)

    return kernel


def _dba_update_fused(c: jnp.ndarray, s_rev: jnp.ndarray, t: int, lanes: int):
    """Single-program path: (Tp, N_pad) layout in, (sums, counts) out."""
    tp_, n_pad = c.shape
    grid = (n_pad // lanes,)
    sums, counts, _ = pl.pallas_call(
        _make_dba_update_kernel(t),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((tp_, n_pad), c.dtype),
            jax.ShapeDtypeStruct((tp_, n_pad), c.dtype),
            # Move-code staging tensor: lives in HBM, reused sequentially by
            # every grid chunk (chunks are serial on a TensorCore).
            jax.ShapeDtypeStruct((2 * t - 1, tp_, lanes), jnp.int8),
        ),
        in_specs=[
            pl.BlockSpec((tp_, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp_, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tp_, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp_, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tp_, lanes), jnp.int8),
            pltpu.VMEM((2, tp_, lanes), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=INTERPRET,
    )(c, s_rev)
    return sums, counts


# ----------------------------------------- split DBA update (large T)
def _make_dba_fwd_kernel(t: int):
    """Forward half of the DBA update as its own program.  Splitting the
    fused kernel in two keeps each phase's scoped-VMEM working set roughly
    half of the fused one, which is what admits the native monthly
    historical resolution (T = 1980; the fused kernel's 19.3 MB at 128
    lanes cannot fit the 16 MB scoped limit).  Shares the pass body with
    the fused kernel (_dba_forward_pass)."""

    def kernel(center_ref, series_rev_ref, moves_hbm, mv_buf, w_sems):
        tp_ = center_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tp_, 1), 0)

        def wr_dma(slot, k):
            return pltpu.make_async_copy(
                mv_buf.at[slot], moves_hbm.at[k], w_sems.at[slot]
            )

        _dba_forward_pass(
            t, center_ref[...], series_rev_ref[...], rows, mv_buf, wr_dma
        )

    return kernel


def _make_dba_bwd_kernel(t: int):
    """Backward half: shares the pass body with the fused kernel
    (_dba_backward_pass).  The series diagonal at the corner (k = 2T-2) is
    a static roll of the reversed series, so the forward pass needs to hand
    over nothing but the move codes."""

    def kernel(series_rev_ref, moves_hbm, sums_ref, counts_ref, rd_buf, r_sems):
        tp_ = series_rev_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tp_, 1), 0)
        # After 2T-2 forward rolls from (1-t) mod Tp the diagonal sits at
        # (t-1) mod Tp: sdiag_last[i] = s[(2t-2)-i] for valid slots.
        sdiag_last = pltpu.roll(series_rev_ref[...], (t - 1) % tp_, axis=0)

        def rd_dma(slot, k):
            return pltpu.make_async_copy(
                moves_hbm.at[k], rd_buf.at[slot], r_sems.at[slot]
            )

        _dba_backward_pass(t, sdiag_last, rows, sums_ref, counts_ref, rd_buf, rd_dma)

    return kernel


def _dba_update_split(c: jnp.ndarray, s_rev: jnp.ndarray, t: int, lanes: int):
    """Two-program path for T beyond the fused kernel's VMEM ceiling.

    Lane chunks run through a lax.map so XLA reuses ONE (2T-1, Tp, lanes)
    int8 move tensor in HBM across chunks (~1 GB at T = 1980 / 128 lanes).
    """
    tp_, n_pad = c.shape

    def one_chunk(blocks):
        c_blk, s_blk = blocks  # (Tp, lanes)
        moves = pl.pallas_call(
            _make_dba_fwd_kernel(t),
            out_shape=jax.ShapeDtypeStruct((2 * t - 1, tp_, lanes), jnp.int8),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, tp_, lanes), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=INTERPRET,
        )(c_blk, s_blk)
        sums, counts = pl.pallas_call(
            _make_dba_bwd_kernel(t),
            out_shape=(
                jax.ShapeDtypeStruct((tp_, lanes), c.dtype),
                jax.ShapeDtypeStruct((tp_, lanes), c.dtype),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, tp_, lanes), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=INTERPRET,
        )(s_blk, moves)
        return sums, counts

    n_chunks = n_pad // lanes
    c_chunks = jnp.moveaxis(c.reshape(tp_, n_chunks, lanes), 1, 0)
    s_chunks = jnp.moveaxis(s_rev.reshape(tp_, n_chunks, lanes), 1, 0)
    sums, counts = jax.lax.map(one_chunk, (c_chunks, s_chunks))
    sums = jnp.moveaxis(sums, 0, 1).reshape(tp_, n_pad)
    counts = jnp.moveaxis(counts, 0, 1).reshape(tp_, n_pad)
    return sums, counts


def dba_update_batch(
    centers: jnp.ndarray,
    series: jnp.ndarray,
    lanes: int = 1024,
    impl: str = "auto",
) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """One DBA alignment pass for a batch of (centre, series) problems.

    Args:
      centers, series: ``(N, T)`` problem pairs.
      lanes: problems per grid chunk.
      impl: ``"auto"`` (fused kernel when it fits scoped VMEM, else the
        split fwd/bwd program pair), or ``"fused"`` / ``"split"`` to force.

    Returns:
      (sums, counts): ``(N, T)`` aligned-value sums and visit counts per
      centre slot — identical to ops.dtw's squared_dtw_with_path +
      _backtrack_accumulate per pair.
    """
    n, t = centers.shape
    if t == 1:
        # Trivial alignment: the single centre slot is visited once per
        # series (the kernels' forward loop has zero iterations at T=1, so
        # their final DMA waits would deadlock on never-started copies).
        return series.astype(centers.dtype), jnp.ones_like(centers)
    tp_ = -(-t // 32) * 32  # 32-aligned sublanes: int8 tile is (32, 128)
    if impl == "auto":
        impl = "fused" if fused_dba_fits(t) else "split"
    # Guard every resolved impl against its own VMEM gate so a caller beyond
    # the ceiling gets a clear error instead of an opaque Mosaic VMEM
    # failure (dba_batch in ops/dtw.py guards before calling; direct callers
    # may not).
    if impl == "fused" and not fused_dba_fits(t):
        raise ValueError(
            f"T={t} exceeds the fused DBA kernel's scoped-VMEM ceiling "
            "(fused_dba_fits(T) is False); use impl='split' or the lax.scan "
            "wavefront path (ops.dtw.dba_batch dispatches automatically)"
        )
    if impl == "split" and not split_dba_fits(t):
        raise ValueError(
            f"T={t} exceeds the split DBA kernel pair's scoped-VMEM ceiling "
            "(split_dba_fits(T) is False, ~T<=2800 on v5e); use the lax.scan "
            "wavefront path (ops.dtw.dba_batch dispatches automatically)"
        )
    # Size lane chunks with the SAME per-element constants and budget the
    # dispatch gates use, so any T the gate admits also gets a chunk width
    # that fits (a 48 B/12 MiB heuristic previously overflowed for
    # T ~ 200-1700 at wide chunks).
    lanes = _lanes_for(
        tp_,
        _DBA_BYTES_PER_ELEM if impl == "fused" else _DBA_SPLIT_BYTES_PER_ELEM,
        lanes,
        n,
        budget=_SCOPED_VMEM_BUDGET,
    )
    n_pad = -(-n // lanes) * lanes
    c = jnp.pad(centers, ((0, n_pad - n), (0, tp_ - t))).T  # (Tp, N_pad)
    s_rev = jnp.pad(series[:, ::-1], ((0, n_pad - n), (0, tp_ - t))).T

    if impl == "fused":
        sums, counts = _dba_update_fused(c, s_rev, t, lanes)
    elif impl == "split":
        sums, counts = _dba_update_split(c, s_rev, t, lanes)
    else:
        raise ValueError(f"unknown impl {impl!r}")
    return sums.T[:n, :t], counts.T[:n, :t]
