"""Golden + property tests for the stochastic subgradient DBA variant.

The reference flagship emulator calls tslearn's
``dtw_barycenter_averaging_subgradient(max_iter=50, tol=1e-3)``
(``/root/reference/ensembles/models.py:176-178``), NOT the classic
exact-mean-update DBA of ``dtwa.py`` — ``ops/dtw.dba_subgradient_batch``
implements those semantics (Schultz & Jain 2018 Algorithm 3).  tslearn is
not installed in this environment, so the oracle below is an independent
numpy implementation of the same algorithm fed the IDENTICAL per-epoch
permutation sequence (recomputed from the same JAX PRNG calls).

Also covers the ``tol=`` converged-mean-target option of the classic
``dba``/``dba_batch`` (VERDICT r3 item 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ensembling_tpu.ops import dtw as dtw_ops

from test_dtw import oracle_sq_dtw


def oracle_sums_counts(center, s):
    """Valence diagonal + warped sums for one (centre, series) pair — the
    same DP/backtrack as test_dtw.oracle_dba_update, returning the raw
    accumulators instead of their ratio."""
    T = len(center)
    sums = np.zeros(T)
    counts = np.zeros(T)
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
    return sums, counts


def jax_epoch_perms(seed, max_iter, b, r):
    """The exact per-epoch series orders dba_subgradient_batch draws."""
    base_key = jax.random.PRNGKey(seed)
    perms = []
    for it in range(max_iter):
        keys = jax.random.split(jax.random.fold_in(base_key, it), b)
        perms.append(
            np.asarray(jax.vmap(lambda k: jax.random.permutation(k, r))(keys))
        )
    return perms  # list of (B, R) int arrays


def oracle_subgradient(series, mask, perms, max_iter=50, tol=1e-3,
                       initial_step_size=0.05, final_step_size=0.005):
    """Single-model numpy subgradient DBA fed an explicit permutation list."""
    valid = np.flatnonzero(mask)
    n = len(valid)
    center = series[valid].mean(axis=0)
    eta = initial_step_size
    decay = (initial_step_size - final_step_size) / (max_iter * n)
    cost_prev = np.inf
    for perm in perms:
        for idx in perm:
            if not mask[idx]:
                continue
            sums, counts = oracle_sums_counts(center, series[idx])
            g = counts * center - sums
            center = center - eta * g
            eta -= decay
        cost = np.mean([oracle_sq_dtw(center, series[k]) for k in valid])
        if abs(cost_prev - cost) < tol or cost > cost_prev:
            break
        cost_prev = cost
    return center


def test_subgradient_matches_numpy_oracle(rng):
    b, r, t = 2, 4, 18
    series = rng.normal(size=(b, r, t))
    mask = np.ones((b, r), bool)
    mask[1, 3] = False  # one padded slot
    max_iter, tol, seed = 6, 1e-4, 7
    got = np.asarray(
        dtw_ops.dba_subgradient_batch(
            jnp.asarray(series), jnp.asarray(mask), max_iter=max_iter,
            tol=tol, seed=seed,
        )
    )
    perms = jax_epoch_perms(seed, max_iter, b, r)
    for m in range(b):
        want = oracle_subgradient(
            series[m], mask[m], [p[m] for p in perms], max_iter=max_iter,
            tol=tol,
        )
        np.testing.assert_allclose(got[m], want, atol=1e-10)


def test_subgradient_single_series_is_fixed_point(rng):
    # R=1 from mean init: the centre IS the series, the path is the diagonal,
    # and the subgradient V∘c - W·x vanishes identically.
    s = rng.normal(size=(1, 1, 25))
    got = np.asarray(dtw_ops.dba_subgradient_batch(jnp.asarray(s)))
    np.testing.assert_allclose(got[0], s[0, 0], atol=1e-12)


def test_subgradient_identical_series_fixed_point(rng):
    one = rng.normal(size=25)
    s = np.broadcast_to(one, (1, 5, 25)).copy()
    got = np.asarray(dtw_ops.dba_subgradient_batch(jnp.asarray(s)))
    np.testing.assert_allclose(got[0], one, atol=1e-12)


def test_subgradient_padding_invariance(rng):
    b, r, t = 2, 3, 16
    series = rng.normal(size=(b, r, t))
    mask = np.ones((b, r), bool)
    padded = np.concatenate([series, np.zeros((b, 2, t))], axis=1)
    pmask = np.concatenate([mask, np.zeros((b, 2), bool)], axis=1)
    a = np.asarray(
        dtw_ops.dba_subgradient_batch(
            jnp.asarray(series), jnp.asarray(mask), max_iter=4, seed=3
        )
    )
    b_ = np.asarray(
        dtw_ops.dba_subgradient_batch(
            jnp.asarray(padded), jnp.asarray(pmask), max_iter=4, seed=3
        )
    )
    # NOT exact: the PRNG permutations differ with R (padded slots are
    # skipped mid-epoch, reordering the same multiset of updates), so the
    # two runs are different interleavings of the same stochastic scheme.
    # They must agree to the scheme's own epoch-to-epoch movement scale.
    assert np.abs(a - b_).max() < 0.2
    # The padded run must not see the zero rows at all: its cost is finite
    # and its centres stay in the data's range.
    assert np.isfinite(b_).all()
    assert np.abs(b_).max() < np.abs(series).max() + 1.0


def test_subgradient_reduces_cost(rng):
    r, t = 6, 30
    base = np.sin(np.linspace(0, 4, t))
    series = base + 0.3 * rng.normal(size=(1, r, t))
    center0 = series[0].mean(axis=0)
    got, info = dtw_ops.dba_subgradient_batch(
        jnp.asarray(series), max_iter=30, tol=1e-6, return_info=True
    )
    cost0 = np.mean([oracle_sq_dtw(center0, s) for s in series[0]])
    cost1 = np.mean([oracle_sq_dtw(np.asarray(got[0]), s) for s in series[0]])
    assert cost1 < cost0
    assert int(info["epochs"]) >= 1
    np.testing.assert_allclose(np.asarray(info["cost"])[0], cost1, rtol=1e-9)


def test_subgradient_respects_max_iter_cap():
    rng = np.random.default_rng(5)
    series = rng.normal(size=(1, 4, 12))
    _, info = dtw_ops.dba_subgradient_batch(
        jnp.asarray(series), max_iter=3, tol=0.0, return_info=True
    )
    assert int(info["epochs"]) <= 3


# ---------------------------------------------------------------------------
# Classic DBA with tol (converged mean target, VERDICT r3 item 3)


def test_classic_dba_tol_zero_matches_fixed_iterations(rng):
    s = rng.normal(size=(2, 4, 20))
    # tol=0 can never trigger, so the cap behaves exactly like n_iterations.
    a = np.asarray(dtw_ops.dba_batch(jnp.asarray(s), n_iterations=7, tol=0.0))
    b = np.asarray(dtw_ops.dba_batch(jnp.asarray(s), n_iterations=7))
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_classic_dba_tol_converges_and_is_stable(rng):
    r, t = 5, 24
    base = np.cos(np.linspace(0, 3, t))
    s = base + 0.2 * rng.normal(size=(1, r, t))
    a = np.asarray(dtw_ops.dba_batch(jnp.asarray(s), n_iterations=200, tol=1e-10))
    # Converged: one more classic update moves the centre < tol.
    from test_dtw import oracle_dba_update

    moved = np.abs(oracle_dba_update(a[0], s[0]) - a[0]).max()
    assert moved < 1e-9
    # And a larger cap gives the identical answer (it stopped on tol).
    b = np.asarray(dtw_ops.dba_batch(jnp.asarray(s), n_iterations=400, tol=1e-10))
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_classic_dba_single_tol(rng):
    s = rng.normal(size=(4, 16))
    a = np.asarray(dtw_ops.dba(jnp.asarray(s), n_iterations=300, init="mean",
                               tol=1e-12))
    b = np.asarray(dtw_ops.dba(jnp.asarray(s), n_iterations=300, init="mean"))
    # The tol run stopped early at the same fixed point the long run reaches.
    np.testing.assert_allclose(a, b, atol=1e-10)


def test_dba_batch_tpu_tol_branch_interpret(rng, monkeypatch):
    """The TPU (Pallas) while_loop tol branch of dba_batch == the fixed-count
    result once converged — exercised via interpret mode with the backend
    check monkeypatched (the jit wrapper is bypassed so the branch decision
    cannot be poisoned by cached CPU-branch traces)."""
    import jax

    from bayesian_ensembling_tpu.ops import dtw_pallas as dp

    r, t = 4, 24
    base = np.cos(np.linspace(0, 3, t))
    s = jnp.asarray(base + 0.2 * rng.normal(size=(1, r, t)))
    want = np.asarray(dtw_ops.dba_batch(s, n_iterations=120))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dp, "INTERPRET", True)
    got = np.asarray(
        dtw_ops.dba_batch.__wrapped__(s, None, n_iterations=200, tol=1e-10)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
