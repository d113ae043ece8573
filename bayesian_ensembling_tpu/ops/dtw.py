"""Dynamic Time Warping + DTW Barycenter Averaging (DBA), TPU-native.

Re-design of ``/root/reference/ensembles/dtwa.py`` (pure-numpy triple loops)
and of the tslearn DBA call inside the flagship emulator
(``models.py:176-178``).  The O(T^2) DTW dynamic program has an anti-diagonal
data dependency, so on TPU it becomes a **wavefront scan**: ``lax.scan`` over
the 2T-1 anti-diagonals, each step doing O(T) vector work on the VPU.  Path
decisions (2 bits/cell) are emitted per diagonal and the backtracking pass is
a second T-bounded scan that *collects* (i, j) index trails, turning the
reference's per-cell Python ``while`` (dtwa.py:130-141) into one segment-sum
scatter.

Everything is mask-aware so ragged realisation counts (1-25 members per CMIP6
model, SURVEY SS7 "hard parts") batch as padded ``(R_max, T)`` blocks under
``vmap``.

Semantics match ``dtwa.py``:
  * squared-Euclidean local cost (dtwa.py:81-85),
  * move preference on ties: diag, then left, then top (dtwa.py:113-126),
  * medoid initialisation over <=50 candidate series (dtwa.py:23-37),
  * barycentre update = mean of aligned points along the warping path
    (dtwa.py:87-143).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp

__all__ = [
    "squared_dtw",
    "squared_dtw_with_path",
    "dtw_pairwise_sq",
    "dba",
    "dba_batch",
    "dba_subgradient_batch",
]

_BIG = jnp.inf


def _diag_delta(center: jnp.ndarray, series_rev: jnp.ndarray, k: jnp.ndarray) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Local cost along anti-diagonal k: delta[i] = (center[i]-series[k-i])^2.

    ``series_rev`` is the series reversed once outside the scan; the diagonal
    slice is then a cyclic roll (``s[k-i] = rev[(T-1-k)+i]``), which lowers to
    cheap dynamic slices instead of a general gather per step — gathers were
    ~50x the cost of the arithmetic on TPU.
    """
    t = center.shape[0]
    i = jnp.arange(t)
    j = k - i
    valid = (j >= 0) & (j < t)
    sj = jnp.roll(series_rev, k - (t - 1))
    delta = jnp.square(center - sj)
    return jnp.where(valid, delta, _BIG), valid


def _shift_down(x: jnp.ndarray) -> jnp.ndarray:
    """x[i] -> x[i-1], with +inf flowing into slot 0."""
    return jnp.concatenate([jnp.full((1,), _BIG, x.dtype), x[:-1]])


def _dtw_scan(center: jnp.ndarray, series: jnp.ndarray, want_path: bool):
    """Wavefront DP over anti-diagonals.

    Returns (total_cost, path) where path is an (2T-1, T) int8 array of move
    codes indexed ``path[i + j, i]`` with 0=diag, 1=left, 2=top (the encoding
    of dtwa.py:88) — or None when ``want_path`` is False.
    """
    t = center.shape[0]
    dtype = jnp.result_type(center.dtype, jnp.float32)
    center = center.astype(dtype)
    series = series.astype(dtype)
    series_rev = series[::-1]

    d0 = jnp.full((t,), _BIG, dtype).at[0].set(jnp.square(center[0] - series[0]))
    prev2 = jnp.full((t,), _BIG, dtype)  # diagonal k-2 (starts as virtual k=-1)

    def step(carry, k):
        prev2, prev1 = carry
        delta, valid = _diag_delta(center, series_rev, k)
        diag = _shift_down(prev2)   # cost at (i-1, j-1)
        left = prev1                # cost at (i,   j-1)
        top = _shift_down(prev1)    # cost at (i-1, j)
        #

        # Tie-break exactly as the reference (dtwa.py:113-126).
        take_diag = (diag <= left) & (diag <= top)
        take_left = ~take_diag & (left <= top)
        best = jnp.where(take_diag, diag, jnp.where(take_left, left, top))
        move = jnp.where(take_diag, 0, jnp.where(take_left, 1, 2)).astype(jnp.int8)
        cur = jnp.where(valid, best + delta, _BIG)
        return (prev1, cur), (move if want_path else None)

    ks = jnp.arange(1, 2 * t - 1)
    (prev2, prev1), moves = jax.lax.scan(step, (prev2, d0), ks)
    total = prev1[t - 1]
    if not want_path:
        return total, None
    path = jnp.concatenate([jnp.full((1, t), -1, jnp.int8), moves], axis=0)
    return total, path


def squared_dtw(center: jnp.ndarray, series: jnp.ndarray) -> jnp.ndarray:
    """Squared-DTW alignment cost between two equal-length 1-D series.

    Matches ``dtwa.py:48-78`` (returns the summed squared local costs along
    the optimal warping path).
    """
    total, _ = _dtw_scan(center, series, want_path=False)
    return total


def squared_dtw_with_path(center: jnp.ndarray, series: jnp.ndarray):
    """Squared-DTW cost plus the (2T-1, T) move matrix for backtracking."""
    return _dtw_scan(center, series, want_path=True)


def dtw_pairwise_sq(series: jnp.ndarray, mask: tp.Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """All-pairs squared-DTW matrix over a stack of series ``(R, T)``.

    Padded rows (mask False) get +inf rows/columns so they never win the
    medoid argmin.  On TPU the R^2 alignment problems run through the fused
    Pallas wavefront kernel (ops/dtw_pallas.py) instead of a vmapped scan.
    """
    r, t = series.shape
    from bayesian_ensembling_tpu.ops.dtw_pallas import (
        dtw_cost_fits,
        squared_dtw_cost_batch,
    )

    # Kernel only when the problem fits its scoped-VMEM ceiling (~T 2500 at
    # the 128-lane multi-chunk model, ~T 3000 when the R(R-1)/2 batch fits a
    # single chunk); beyond that the vmapped lax.scan wavefront below IS the
    # dispatch the kernel's own ValueError points to.
    if jax.default_backend() == "tpu" and dtw_cost_fits(t, n=r * (r - 1) // 2):
        # Squared-DTW is symmetric with a zero diagonal (the DP recurrence
        # mirrors under i<->j), so only the R(R-1)/2 upper-triangle problems
        # run through the kernel — half the wavefront work of all R^2 pairs.
        if r == 1:
            d = jnp.zeros((1, 1), series.dtype)
        else:
            iu, ju = jnp.triu_indices(r, k=1)
            d_half = squared_dtw_cost_batch(series[iu], series[ju])
            d = jnp.zeros((r, r), d_half.dtype).at[iu, ju].set(d_half)
            d = d + d.T
    else:
        f = jax.vmap(jax.vmap(squared_dtw, in_axes=(None, 0)), in_axes=(0, None))
        d = f(series, series)
    if mask is not None:
        valid = mask[:, None] & mask[None, :]
        d = jnp.where(valid, d, _BIG)
    return d


def _backtrack_accumulate(path: jnp.ndarray, series: jnp.ndarray):
    """Accumulate the DBA update along the optimal warping path.

    Instead of walking the path cell-by-cell with per-step gathers
    (dtwa.py:130-141 does this in Python; a scalar-gather scan was ~50x
    slower than the arithmetic on TPU), the path membership is propagated
    *backward over anti-diagonals*: a cell is on the path iff one of its
    successors is on the path and chose it.  Every step is a masked vector
    op over a T-wide diagonal — no gathers, no scatters — and the
    contributions ``series[j] -> centre slot i`` accumulate in the scan
    carry via the same reversed-series roll trick as the forward DP.

    Args:
      path: ``(2T-1, T)`` move codes, row k = anti-diagonal k, indexed by i.
      series: ``(T,)``.

    Returns:
      (sums, counts): ``(T,)`` aligned-value sums and visit counts per slot.
    """
    t = series.shape[0]
    dtype = jnp.result_type(series.dtype, jnp.float32)
    series_rev = series[::-1].astype(dtype)
    i_idx = jnp.arange(t)

    def shift_up(x, pad):
        return jnp.concatenate([x[1:], jnp.full((1,), pad, x.dtype)])

    def diag_vals(k):
        return jnp.roll(series_rev, k - (t - 1))  # value s[k-i] at slot i

    # Initial state: diagonal 2T-2 holds only the corner (T-1, T-1), which is
    # always on the path.
    on_k1 = (i_idx == t - 1)
    on_k2 = jnp.zeros((t,), bool)
    moves_k2 = jnp.full((t,), -1, jnp.int8)
    sums0 = jnp.where(on_k1, diag_vals(2 * t - 2), 0.0)
    counts0 = on_k1.astype(dtype)

    def step(carry, inp):
        on_k1, on_k2, moves_k2, sums, counts = carry
        moves_k1, k = inp
        diag_t = shift_up(on_k2 & (moves_k2 == 0), False)
        left_t = on_k1 & (moves_k1 == 1)
        top_t = shift_up(on_k1 & (moves_k1 == 2), False)
        # cell (i, j=k-i) is in the matrix iff 0 <= i < t and 0 <= j < t
        # (the second clause bounds j; it was previously a duplicate of the
        # first and relied on move codes never pointing outside the matrix).
        valid = (k - i_idx >= 0) & (k - i_idx <= t - 1)
        on_k = (diag_t | left_t | top_t) & valid
        sums = sums + jnp.where(on_k, diag_vals(k), 0.0)
        counts = counts + on_k.astype(dtype)
        return (on_k, on_k1, moves_k1, sums, counts), None

    ks = jnp.arange(2 * t - 3, -1, -1)
    moves_rows = path[ks + 1]  # moves for diagonal k+1, k descending
    (_, _, _, sums, counts), _ = jax.lax.scan(
        step, (on_k1, on_k2, moves_k2, sums0, counts0), (moves_rows, ks)
    )
    return sums, counts


def _dba_update(center: jnp.ndarray, series: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """One DBA iteration: align every series to the centre, average aligned
    points (dtwa.py:87-143), honouring the padding mask."""

    def one(s):
        _, path = squared_dtw_with_path(center, s)
        return _backtrack_accumulate(path, s)

    sums, counts = jax.vmap(one)(series)
    m = mask.astype(center.dtype)[:, None]
    tot = jnp.sum(sums * m, axis=0)
    cnt = jnp.sum(counts * m, axis=0)
    return tot / jnp.maximum(cnt, 1.0)


@functools.partial(jax.jit, static_argnames=("n_iterations", "init"))
def dba(
    series: jnp.ndarray,
    mask: tp.Optional[jnp.ndarray] = None,
    n_iterations: int = 10,
    init: str = "medoid",
    tol: tp.Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DTW Barycenter Averaging of a stack of equal-length series.

    Args:
      series: ``(R, T)`` stack of realisations (padded rows allowed).
      mask: optional ``(R,)`` bool validity of each row.
      n_iterations: fixed DBA iterations (reference default: dtwa.py:6) —
        or, when ``tol`` is given, the iteration CAP.
      init: ``"medoid"`` — the dtwa.py:14 initialisation (exact over all
        candidates; the reference samples 50 when R > 50, workloads here
        have R <= 200) — or ``"mean"``, the masked euclidean mean, which is
        tslearn's default init for the subgradient DBA the flagship emulator
        actually calls (models.py:176) and skips the O(R^2 T^2) pairwise
        medoid search entirely.
      tol: optional convergence tolerance on the barycentre's movement
        (``max |Δcentre|`` between iterations).  The reference's classic DBA
        has NO stopping rule (dtwa.py:6 fixed ``n_iterations``); this opt-in
        gives a *converged* mean target — BASELINE.md measured the fixed
        10-iteration convention still moving ~0.1 °C at monthly T.

    Returns:
      ``(T,)`` barycentre series.
    """
    r, t = series.shape
    if mask is None:
        mask = jnp.ones((r,), bool)

    if init == "medoid":
        pair = dtw_pairwise_sq(series, mask)
        finite = jnp.isfinite(pair)
        ss = jnp.sum(jnp.where(finite, pair, 0.0), axis=1)
        ss = jnp.where(mask, ss, jnp.inf)
        center = series[jnp.argmin(ss)]
    elif init == "mean":
        w = mask.astype(series.dtype)[:, None]
        center = jnp.sum(series * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    else:
        raise ValueError(f"unknown init {init!r}")

    if tol is None:
        def body(c, _):
            return _dba_update(c, series, mask), None

        center, _ = jax.lax.scan(body, center, None, length=n_iterations)
        return center

    def cond(st):
        _, it, moved = st
        return (it < n_iterations) & (moved >= tol)

    def wbody(st):
        c, it, _ = st
        new = _dba_update(c, series, mask)
        return new, it + 1, jnp.max(jnp.abs(new - c))

    center, _, _ = jax.lax.while_loop(
        cond, wbody, (center, jnp.int32(0), jnp.asarray(jnp.inf, center.dtype))
    )
    return center


@functools.partial(jax.jit, static_argnames=("n_iterations", "init"))
def dba_batch(
    series: jnp.ndarray,
    mask: tp.Optional[jnp.ndarray] = None,
    n_iterations: int = 10,
    init: str = "mean",
    tol: tp.Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DBA for a whole batch of models at once: ``(B, R, T) -> (B, T)``.

    The TPU-hot entry point used by the emulators.  On TPU every DBA
    iteration runs ALL ``B*R`` alignment problems through ONE fused Pallas
    program (forward DP + backward on-path sweep, ops/dtw_pallas.py
    ``dba_update_batch``) instead of ``B*R`` vmapped 2T-1-step scans — the
    scan path's per-diagonal loop overhead was ~19% of the full-experiment
    bench (VERDICT r1 item 3).  Off-TPU it falls back to ``vmap(dba)``.

    ``tol`` (opt-in) turns ``n_iterations`` into a CAP and stops each model
    once its barycentre moves less than ``tol`` (max |Δ|) in an iteration —
    the converged-mean-target mode (see :func:`dba`).
    """
    b, r, t = series.shape
    if mask is None:
        mask = jnp.ones((b, r), bool)

    from bayesian_ensembling_tpu.ops.dtw_pallas import (
        dba_update_batch,
        dtw_cost_fits,
        split_dba_fits,
        squared_dtw_cost_batch,
    )

    # The Pallas DBA update has a hard T ceiling (~2800: the split-kernel
    # pair's scoped-VMEM working set at the minimum lane chunk; up to ~1700
    # the faster single fused program is used — dba_update_batch picks).
    # Beyond the ceiling the scan-based wavefront path takes over (it keeps
    # no (T, lanes) residency; the move planes live in HBM).
    if jax.default_backend() != "tpu" or not split_dba_fits(t):
        return jax.vmap(
            lambda s, m: dba(s, m, n_iterations=n_iterations, init=init, tol=tol)
        )(series, mask)

    w = mask.astype(series.dtype)
    if init == "mean":
        centers = jnp.sum(series * w[:, :, None], axis=1) / jnp.maximum(
            jnp.sum(w, axis=1, keepdims=True), 1.0
        )
    elif init == "medoid":
        # All B*R(R-1)/2 upper-triangle costs in one fused kernel call
        # (squared-DTW is symmetric with a zero diagonal).
        if r == 1:
            d = jnp.zeros((b, 1, 1), series.dtype)
        else:
            iu, ju = jnp.triu_indices(r, k=1)
            ci = series[:, iu].reshape(b * iu.size, t)
            sj = series[:, ju].reshape(b * ju.size, t)
            # The cost kernel's VMEM ceiling (~T 2500 multi-chunk) sits
            # BELOW the split-DBA gate that admitted this T (~2880), so the
            # medoid costs need their own dispatch: scan wavefront when the
            # kernel cannot take the batch.
            if dtw_cost_fits(t, n=b * iu.size):
                d_half = squared_dtw_cost_batch(ci, sj)
            else:
                d_half = jax.vmap(squared_dtw)(ci, sj)
            d_half = d_half.reshape(b, iu.size)
            d = jnp.zeros((b, r, r), d_half.dtype).at[:, iu, ju].set(d_half)
            d = d + jnp.swapaxes(d, 1, 2)
        valid = mask[:, :, None] & mask[:, None, :]
        ss = jnp.sum(jnp.where(valid, d, 0.0), axis=2)
        ss = jnp.where(mask, ss, jnp.inf)
        centers = jnp.take_along_axis(
            series, jnp.argmin(ss, axis=1)[:, None, None], axis=1
        )[:, 0]
    else:
        raise ValueError(f"unknown init {init!r}")

    s_flat = series.reshape(b * r, t)

    def update(centers):
        c_flat = jnp.repeat(centers, r, axis=0)
        sums, counts = dba_update_batch(c_flat, s_flat)
        m = w[:, :, None]
        tot = jnp.sum(sums.reshape(b, r, t) * m, axis=1)
        cnt = jnp.sum(counts.reshape(b, r, t) * m, axis=1)
        return tot / jnp.maximum(cnt, 1.0)

    if tol is None:
        centers, _ = jax.lax.scan(
            lambda c, _: (update(c), None), centers, None, length=n_iterations
        )
        return centers

    def cond(st):
        _, done, it = st
        return (it < n_iterations) & ~jnp.all(done)

    def wbody(st):
        centers, done, it = st
        new = update(centers)
        new = jnp.where(done[:, None], centers, new)  # freeze converged models
        moved = jnp.max(jnp.abs(new - centers), axis=1)
        return new, done | (moved < tol), it + 1

    centers, _, _ = jax.lax.while_loop(
        cond, wbody, (centers, jnp.zeros((b,), bool), jnp.int32(0))
    )
    return centers


def _dba_sums_counts(centers: jnp.ndarray, xs: jnp.ndarray):
    """Aligned-value sums + visit counts for N (centre, series) pairs.

    ``(N, T), (N, T) -> ((N, T), (N, T))`` — the valence diagonal V and the
    warped sum W·x of the subgradient update, identical quantities to the
    classic DBA update's accumulators.  Dispatches to the fused/split Pallas
    wavefront kernels on TPU, the vmapped scan elsewhere.
    """
    t = centers.shape[1]
    from bayesian_ensembling_tpu.ops.dtw_pallas import (
        dba_update_batch,
        split_dba_fits,
    )

    if jax.default_backend() == "tpu" and split_dba_fits(t):
        return dba_update_batch(centers, xs)

    def one(c, s):
        _, path = squared_dtw_with_path(c, s)
        return _backtrack_accumulate(path, s)

    return jax.vmap(one)(centers, xs)


def _sq_dtw_costs(centers: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Squared-DTW costs for N (centre, series) pairs: ``(N, T) x 2 -> (N,)``."""
    n, t = xs.shape
    from bayesian_ensembling_tpu.ops.dtw_pallas import (
        dtw_cost_fits,
        squared_dtw_cost_batch,
    )

    if jax.default_backend() == "tpu" and dtw_cost_fits(t, n=n):
        return squared_dtw_cost_batch(centers, xs)
    return jax.vmap(squared_dtw)(centers, xs)


@functools.partial(jax.jit, static_argnames=("max_iter", "return_info"))
def dba_subgradient_batch(
    series: jnp.ndarray,
    mask: tp.Optional[jnp.ndarray] = None,
    max_iter: int = 50,
    tol: float = 1e-3,
    initial_step_size: float = 0.05,
    final_step_size: float = 0.005,
    seed: int = 0,
    return_info: bool = False,
):
    """Stochastic subgradient DBA — the variant the reference flagship calls.

    ``GPDTW1D.fit`` uses tslearn's ``dtw_barycenter_averaging_subgradient``
    with ``max_iter=50, tol=1e-3`` (reference ``ensembles/models.py:176-178``)
    — Schultz & Jain (2018) Algorithm 3, NOT the classic exact-mean-update
    DBA of ``ensembles/dtwa.py`` — so this implements those semantics,
    batched over models: ``(B, R, T) -> (B, T)``.

    Per epoch, each model visits its series in a fresh random order and takes
    one subgradient step per series::

        centre <- centre - eta * (V ∘ centre - W·x)

    where V (valence) counts the centre slots' visits along the optimal
    warping path against that series and W·x sums the aligned series values
    — exactly the accumulators of the classic update, so the same wavefront
    kernels serve both.  ``eta`` decays linearly from ``initial_step_size``
    to ``final_step_size`` over ``max_iter * R`` steps (tslearn's schedule).
    After each epoch the Petitjean cost (mean squared-DTW of the centre to
    all series) stops a model when it changes by less than ``tol`` or
    increases (tslearn's ConvergenceWarning break).

    Deliberate deviations from tslearn, both measure-zero or interleaving-
    only on real data: (a) the random epoch order comes from JAX's
    threefry PRNG (the reference passes no ``random_state``, so its own
    sequence is nondeterministic); (b) padded realisation slots are skipped
    mid-epoch rather than never drawn — the same multiset of updates in a
    different interleaving; (c) DP tie-breaks prefer diag/left/top
    (dtwa.py's convention) where tslearn's backtracking differs on exact
    cost ties.

    Args:
      series: ``(B, R, T)`` padded realisation stacks.
      mask: ``(B, R)`` validity.
      max_iter: epoch cap (the reference passes 50).
      tol: epoch-to-epoch cost tolerance (the reference passes 1e-3).
      initial_step_size / final_step_size: tslearn's defaults 0.05 / 0.005.
      seed: PRNG seed for the per-epoch series orders.
      return_info: also return ``{"epochs", "cost", "converged"}``.

    Returns:
      ``(B, T)`` barycentres — plus the info dict when ``return_info``.
    """
    b, r, t = series.shape
    if mask is None:
        mask = jnp.ones((b, r), bool)
    dtype = jnp.result_type(series.dtype, jnp.float32)
    series = series.astype(dtype)
    w = mask.astype(dtype)
    n_valid = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # (B,)

    # tslearn _init_avg: the euclidean mean (series are equal-length here).
    centers0 = jnp.sum(series * w[:, :, None], axis=1) / n_valid[:, None]
    eta0 = jnp.full((b,), initial_step_size, dtype)
    decay = (initial_step_size - final_step_size) / (max_iter * n_valid)
    s_flat = series.reshape(b * r, t)
    base_key = jax.random.PRNGKey(seed)

    def epoch_cost(centers):
        crep = jnp.repeat(centers, r, axis=0)
        costs = _sq_dtw_costs(crep, s_flat).reshape(b, r)
        return jnp.sum(costs * w, axis=1) / n_valid

    def cond(st):
        _, _, _, done, it = st
        return (it < max_iter) & ~jnp.all(done)

    def body(st):
        centers, eta, cost_prev, done, it = st
        keys = jax.random.split(jax.random.fold_in(base_key, it), b)
        perm = jax.vmap(lambda k: jax.random.permutation(k, r))(keys)  # (B, R)

        def inner(carry, idx):
            centers, eta = carry
            xs = series[jnp.arange(b), idx]  # (B, T)
            valid = mask[jnp.arange(b), idx] & ~done
            sums, counts = _dba_sums_counts(centers, xs)
            g = counts * centers - sums
            centers = jnp.where(valid[:, None], centers - eta[:, None] * g, centers)
            eta = jnp.where(valid, eta - decay, eta)
            return (centers, eta), None

        (centers, eta), _ = jax.lax.scan(inner, (centers, eta), perm.T)
        cost = epoch_cost(centers)
        done = done | (jnp.abs(cost_prev - cost) < tol) | (cost > cost_prev)
        return centers, eta, cost, done, it + 1

    state0 = (
        centers0,
        eta0,
        jnp.full((b,), jnp.inf, dtype),
        jnp.zeros((b,), bool),
        jnp.int32(0),
    )
    centers, _, cost, done, it = jax.lax.while_loop(cond, body, state0)
    if return_info:
        return centers, {"epochs": it, "cost": cost, "converged": done}
    return centers
