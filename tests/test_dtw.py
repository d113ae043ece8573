"""Golden tests for the wavefront DTW/DBA kernels.

The oracle is an independent textbook O(T^2) dynamic program written here in
plain numpy (NOT imported from anywhere) using the same move preference
(diag, then left, then top) as the semantics we target.
"""

import numpy as np
import pytest

from bayesian_ensembling_tpu.ops import dtw as dtw_ops


def oracle_sq_dtw(a, b):
    """Textbook squared-DTW cost DP (numpy, independent implementation)."""
    n, m = len(a), len(b)
    delta = np.subtract.outer(a, b) ** 2
    cost = np.full((n, m), np.inf)
    cost[0, 0] = delta[0, 0]
    for i in range(1, n):
        cost[i, 0] = cost[i - 1, 0] + delta[i, 0]
    for j in range(1, m):
        cost[0, j] = cost[0, j - 1] + delta[0, j]
    for i in range(1, n):
        for j in range(1, m):
            cost[i, j] = delta[i, j] + min(
                cost[i - 1, j - 1], cost[i, j - 1], cost[i - 1, j]
            )
    return cost[-1, -1]


def oracle_dba_update(center, series_stack):
    """One DBA iteration: average series points aligned to each centre slot,
    with diag-then-left-then-top tie-breaking on the backtrack."""
    T = len(center)
    sums = np.zeros(T)
    counts = np.zeros(T)
    for s in series_stack:
        delta = np.subtract.outer(center, s) ** 2
        cost = np.full((T, T), np.inf)
        move = np.full((T, T), -1, int)
        cost[0, 0] = delta[0, 0]
        for i in range(1, T):
            cost[i, 0] = cost[i - 1, 0] + delta[i, 0]
            move[i, 0] = 2
        for j in range(1, T):
            cost[0, j] = cost[0, j - 1] + delta[0, j]
            move[0, j] = 1
        for i in range(1, T):
            for j in range(1, T):
                diag, left, top = cost[i - 1, j - 1], cost[i, j - 1], cost[i - 1, j]
                if diag <= left and diag <= top:
                    best, mv = diag, 0
                elif left <= top:
                    best, mv = left, 1
                else:
                    best, mv = top, 2
                cost[i, j] = best + delta[i, j]
                move[i, j] = mv
        i = j = T - 1
        while True:
            sums[i] += s[j]
            counts[i] += 1
            if move[i, j] == -1:
                break
            mv = move[i, j]
            if mv == 0:
                i, j = i - 1, j - 1
            elif mv == 1:
                j -= 1
            else:
                i -= 1
        assert i == 0 and j == 0
    return sums / counts


@pytest.mark.parametrize("t", [5, 17, 64])
def test_squared_dtw_matches_oracle(rng, t):
    a = rng.normal(size=t)
    b = rng.normal(size=t)
    got = float(dtw_ops.squared_dtw(a, b))
    want = oracle_sq_dtw(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_squared_dtw_identical_series_zero(rng):
    a = rng.normal(size=32)
    assert float(dtw_ops.squared_dtw(a, a)) == pytest.approx(0.0, abs=1e-12)


def test_pairwise_matrix(rng):
    series = rng.normal(size=(4, 12))
    mat = np.asarray(dtw_ops.dtw_pairwise_sq(series))
    for i in range(4):
        for j in range(4):
            np.testing.assert_allclose(
                mat[i, j], oracle_sq_dtw(series[i], series[j]), rtol=1e-10
            )


def test_pairwise_mask_infs(rng):
    series = rng.normal(size=(4, 10))
    mask = np.array([True, True, False, True])
    mat = np.asarray(dtw_ops.dtw_pairwise_sq(series, mask))
    assert np.isinf(mat[2]).all() and np.isinf(mat[:, 2]).all()
    assert np.isfinite(mat[0, 1])


def test_dba_update_matches_oracle(rng):
    t, r = 20, 4
    series = rng.normal(size=(r, t))
    center = series[0]
    got = np.asarray(
        dtw_ops._dba_update(
            np.asarray(center), np.asarray(series), np.ones(r, bool)
        )
    )
    want = oracle_dba_update(center, series)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_dba_constant_series_returns_constant(rng):
    series = np.tile(np.linspace(0.0, 1.0, 15), (3, 1))
    center = np.asarray(dtw_ops.dba(series, n_iterations=3))
    np.testing.assert_allclose(center, series[0], atol=1e-10)


def test_dba_mask_ignores_padding(rng):
    t = 12
    real = rng.normal(size=(3, t))
    padded = np.concatenate([real, np.full((2, t), 777.0)], axis=0)
    mask = np.array([True] * 3 + [False] * 2)
    with_pad = np.asarray(dtw_ops.dba(padded, mask, n_iterations=4))
    without = np.asarray(dtw_ops.dba(real, n_iterations=4))
    np.testing.assert_allclose(with_pad, without, rtol=1e-8)


def test_dba_reduces_alignment_cost(rng):
    series = rng.normal(size=(5, 24)) + np.sin(np.linspace(0, 3, 24))
    center0 = series[0]
    center = np.asarray(dtw_ops.dba(series, n_iterations=8))
    cost0 = sum(oracle_sq_dtw(center0, s) for s in series)
    cost1 = sum(oracle_sq_dtw(center, s) for s in series)
    assert cost1 <= cost0 + 1e-9


def test_pallas_dtw_cost_batch_interpret(rng, monkeypatch):
    """Fused Pallas wavefront kernel vs the scan implementation."""
    from bayesian_ensembling_tpu.ops import dtw_pallas

    monkeypatch.setattr(dtw_pallas, "INTERPRET", True)
    n, t = 7, 21
    centers = rng.normal(size=(n, t)).astype(np.float32)
    series = rng.normal(size=(n, t)).astype(np.float32)
    got = np.asarray(dtw_pallas.squared_dtw_cost_batch(centers, series, lanes=128))
    for i in range(n):
        want = float(dtw_ops.squared_dtw(centers[i], series[i]))
        np.testing.assert_allclose(got[i], want, rtol=1e-5)


def test_pallas_dtw_multi_chunk_interpret(rng, monkeypatch):
    from bayesian_ensembling_tpu.ops import dtw_pallas

    monkeypatch.setattr(dtw_pallas, "INTERPRET", True)
    n, t = 260, 12  # forces >1 grid chunk at lanes=128
    centers = rng.normal(size=(n, t)).astype(np.float32)
    series = rng.normal(size=(n, t)).astype(np.float32)
    got = np.asarray(dtw_pallas.squared_dtw_cost_batch(centers, series, lanes=128))
    for i in (0, 129, 259):
        want = float(dtw_ops.squared_dtw(centers[i], series[i]))
        np.testing.assert_allclose(got[i], want, rtol=1e-5)


def test_dba_update_batch_interpret_matches_scan(rng):
    """Fused Pallas DBA update (forward DP + backward on-path sweep in one
    program) == the scan-path pair, interpret mode (VERDICT r1 item 3)."""
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.ops import dtw as dtw_ops
    from bayesian_ensembling_tpu.ops import dtw_pallas as dp

    old = dp.INTERPRET
    dp.INTERPRET = True
    try:
        for t in (9, 24, 165):
            n = 5
            centers = rng.normal(size=(n, t)).astype(np.float32)
            series = rng.normal(size=(n, t)).astype(np.float32)
            sums, counts = dp.dba_update_batch(
                jnp.asarray(centers), jnp.asarray(series)
            )

            def one(c, s):
                _, path = dtw_ops.squared_dtw_with_path(c, s)
                return dtw_ops._backtrack_accumulate(path, s)

            w_sums, w_counts = jax.vmap(one)(
                jnp.asarray(centers), jnp.asarray(series)
            )
            np.testing.assert_array_equal(np.asarray(counts), np.asarray(w_counts))
            np.testing.assert_allclose(
                np.asarray(sums), np.asarray(w_sums), rtol=1e-6, atol=1e-6
            )
    finally:
        dp.INTERPRET = old


def test_dba_batch_cpu_fallback_matches_vmap(rng):
    """dba_batch off-TPU == vmap(dba) (same code path, sanity)."""
    import functools

    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.ops import dtw as dtw_ops

    b, r, t = 3, 4, 20
    series = jnp.asarray(rng.normal(size=(b, r, t)))
    mask = jnp.asarray(rng.random((b, r)) < 0.8)
    got = dtw_ops.dba_batch(series, mask, n_iterations=3, init="mean")
    want = jax.vmap(
        functools.partial(dtw_ops.dba, n_iterations=3, init="mean")
    )(series, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_lanes_for_scales_with_t():
    """Monthly resolutions (T=1032-1980) must shrink the lane chunk to fit
    VMEM instead of overflowing; annual T~165 keeps the wide defaults."""
    from bayesian_ensembling_tpu.ops.dtw_pallas import _lanes_for

    # annual: (192, 1024) x 48B = 9.4 MB fits the 12 MB budget
    assert _lanes_for(192, 48, 1024, 10_000) == 1024
    # monthly historical: (1984, L) x 48B must keep L minimal
    l_monthly = _lanes_for(1984, 48, 1024, 10_000)
    assert l_monthly == 128
    # never exceeds what the batch needs
    assert _lanes_for(192, 48, 2048, 100) == 128
    # budget arithmetic: chosen chunk actually fits 12 MB
    assert 1984 * 48 * l_monthly <= 12 * 2**20


def test_fused_dba_ceiling():
    from bayesian_ensembling_tpu.ops.dtw_pallas import fused_dba_fits

    assert fused_dba_fits(165)  # annual production config
    assert fused_dba_fits(1032)  # monthly SSP resolution
    assert not fused_dba_fits(1980)  # monthly historical: scan path


def test_dba_update_split_interpret_matches_scan(rng):
    """Split (fwd/bwd program pair) DBA update == the scan-path pair,
    interpret mode — the large-T path used beyond the fused kernel's
    scoped-VMEM ceiling (monthly historical T = 1980)."""
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.ops import dtw as dtw_ops
    from bayesian_ensembling_tpu.ops import dtw_pallas as dp

    old = dp.INTERPRET
    dp.INTERPRET = True
    try:
        for t in (9, 24, 165):
            n = 5
            centers = rng.normal(size=(n, t)).astype(np.float32)
            series = rng.normal(size=(n, t)).astype(np.float32)
            sums, counts = dp.dba_update_batch(
                jnp.asarray(centers), jnp.asarray(series), impl="split"
            )

            def one(c, s):
                _, path = dtw_ops.squared_dtw_with_path(c, s)
                return dtw_ops._backtrack_accumulate(path, s)

            w_sums, w_counts = jax.vmap(one)(
                jnp.asarray(centers), jnp.asarray(series)
            )
            np.testing.assert_array_equal(np.asarray(counts), np.asarray(w_counts))
            np.testing.assert_allclose(
                np.asarray(sums), np.asarray(w_sums), rtol=1e-6, atol=1e-6
            )
    finally:
        dp.INTERPRET = old


def test_dba_ceilings():
    from bayesian_ensembling_tpu.ops.dtw_pallas import (
        fused_dba_fits,
        split_dba_fits,
    )

    assert fused_dba_fits(165) and split_dba_fits(165)
    assert fused_dba_fits(1032)
    assert not fused_dba_fits(1980)  # fused cannot fit monthly historical
    assert split_dba_fits(1980)  # ...the split pair can
    assert not split_dba_fits(3000)  # beyond it: scan path
