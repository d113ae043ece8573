"""Coarse-to-fine warm-started gridded fits (VERDICT r2 item 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_ensembling_tpu.parallel.gridded import (
    coarse_cell_indices,
    coarse_warm_start,
    gridded_ensemble_step,
)
from bayesian_ensembling_tpu.parallel.step import emulate_marginals
from bayesian_ensembling_tpu.ops import gp as gp_ops


def test_coarse_cell_indices_geometry():
    coarse, nearest = coarse_cell_indices(6, 8, 2)
    # every 2nd row/col: 3 x 4 coarse cells
    assert coarse.size == 12
    assert nearest.shape == (48,)
    assert nearest.min() >= 0 and nearest.max() < 12
    # a coarse cell is its own nearest neighbour
    for i, c in enumerate(coarse):
        assert nearest[c] == i
    # cell (1,1) rounds to coarse (row 1 -> rows index round(0.5)=0 or 1,
    # both valid nearest); just check adjacency: the mapped coarse cell is
    # within stride of the fine cell in both axes.
    lon = 8
    for c in range(48):
        fi, fj = divmod(c, lon)
        ci, cj = divmod(int(coarse[nearest[c]]), lon)
        assert abs(fi - ci) <= 2 and abs(fj - cj) <= 2


def test_coarse_cell_indices_stride_one_is_identity():
    coarse, nearest = coarse_cell_indices(3, 4, 1)
    np.testing.assert_array_equal(coarse, np.arange(12))
    np.testing.assert_array_equal(nearest, np.arange(12))
    with pytest.raises(ValueError):
        coarse_cell_indices(3, 4, 0)


def test_fit_gp_batch_init_passthrough(rng):
    """init=converged params + tiny extra run stays at the optimum."""
    m, t, d = 3, 20, 4
    x = jnp.asarray(rng.normal(size=(m, t, d)).astype(np.float32))
    y = jnp.asarray(np.sin(np.linspace(0, 3, t))[None, :] * np.ones((m, 1)), jnp.float32)
    nv = jnp.full((m, t), 0.05, jnp.float32)
    params, losses = gp_ops.fit_gp_batch(x, y, nv, n_optim_nits=300)
    params2, losses2 = gp_ops.fit_gp_batch(x, y, nv, n_optim_nits=10, init=params)
    # warm continuation starts AT the converged objective (not at scratch)
    # and never worsens it.
    assert float(losses2[:, 0].sum()) <= float(losses[:, -1].sum()) + 1e-2
    assert float(losses2[:, -1].sum()) <= float(losses2[:, 0].sum()) + 1e-2
    # and it is far below where a scratch run starts
    assert float(losses2[:, 0].sum()) < float(losses[:, 0].sum()) - 1.0


def _grid_workload(rng, la=4, lo=6, m=2, r=4, t=24):
    c = la * lo
    signal = np.sin(np.linspace(0, 3, t))
    block = (signal + 0.3 * rng.normal(size=(m, c, r, t))).astype(np.float32)
    obs = (signal + 0.3 * rng.normal(size=(c, 5, t))).astype(np.float32)
    return block, obs


def test_warm_start_beats_scratch_at_fifth_the_steps(rng):
    """The warm start's contract: coarse(full) + fine(nits/5) lands AT
    LEAST as close to the converged optimum as scratch(nits) — measured
    against a long-run reference (neither path is fully converged at the
    production step counts; comparing them to each other would measure two
    different under-converged trajectories)."""
    la, lo = 3, 4
    block, obs = _grid_workload(rng, la, lo, m=2, t=40)
    m, c, r, t = block.shape
    mask = jnp.ones((m, c, r), bool)
    nits = 300

    truth = gridded_ensemble_step(
        jnp.asarray(block), jnp.asarray(obs), mask, n_optim_nits=3000
    )
    scratch = gridded_ensemble_step(
        jnp.asarray(block), jnp.asarray(obs), mask, n_optim_nits=nits
    )
    gp_init = coarse_warm_start(
        jnp.asarray(block), mask, la, lo, 2, n_optim_nits=nits
    )
    warm = gridded_ensemble_step(
        jnp.asarray(block), jnp.asarray(obs), mask, n_optim_nits=nits // 5,
        gp_init=gp_init,
    )

    def dist(x):
        return max(
            float(np.abs(np.asarray(x[0]) - np.asarray(truth[0])).max()),
            float(np.abs(np.asarray(x[1]) - np.asarray(truth[1])).max()),
        )

    assert dist(warm) <= dist(scratch) * 1.2, (dist(warm), dist(scratch))


def test_warm_bfgs_beats_scratch_bfgs_at_third_the_steps(rng):
    """Coarse-to-fine composed with the per-model damped quasi-Newton:
    a bfgs fine pass warm-started from a stride-S bfgs coarse fit must
    land at least as close to the converged optimum as the scratch bfgs
    fit at the full step count (the fine pass rebuilds its 2x2 Hessian
    from identity, so this asserts the warm INIT carries the value even
    without carried curvature)."""
    la, lo = 3, 4
    block, obs = _grid_workload(rng, la, lo, m=2, t=40)
    m, c, r, t = block.shape
    mask = jnp.ones((m, c, r), bool)
    nits = 30

    truth = gridded_ensemble_step(
        jnp.asarray(block), jnp.asarray(obs), mask, n_optim_nits=3000
    )
    scratch = gridded_ensemble_step(
        jnp.asarray(block), jnp.asarray(obs), mask, n_optim_nits=nits,
        optimizer="bfgs",
    )
    gp_init = coarse_warm_start(
        jnp.asarray(block), mask, la, lo, 2, n_optim_nits=nits,
        optimizer="bfgs",
    )
    warm = gridded_ensemble_step(
        jnp.asarray(block), jnp.asarray(obs), mask, n_optim_nits=nits // 3,
        gp_init=gp_init, optimizer="bfgs",
    )

    def dist(x):
        return max(
            float(np.abs(np.asarray(x[0]) - np.asarray(truth[0])).max()),
            float(np.abs(np.asarray(x[1]) - np.asarray(truth[1])).max()),
        )

    assert dist(warm) <= dist(scratch) * 1.2, (dist(warm), dist(scratch))


def test_warm_start_shape_checks():
    block = jnp.zeros((2, 10, 3, 8))
    mask = jnp.ones((2, 10, 3), bool)
    with pytest.raises(ValueError, match="lat\\*lon"):
        coarse_warm_start(block, mask, 3, 4, 2, n_optim_nits=2)


# ---------------------------------------------------------------------------
# Coarse-to-fine IN TIME (ops/gp.fit_gp_batch_warm_time): the monthly-T
# sibling of the spatial warm start above.  Measured adoption evidence in
# benchmarks/monthly_warm_bench.py (stride-12 warm beats the scratch-500
# production fit on BOTH closeness-to-converged-truth and wall clock).


def _time_workload(rng, m=3, r=4, t=96):
    signal = np.sin(np.linspace(0, 6, t))
    block = (signal + 0.3 * rng.normal(size=(m, r, t))).astype(np.float32)
    x = jnp.asarray(np.swapaxes(block, 1, 2))  # (M, T, R) features
    y = jnp.asarray(block.mean(axis=1))
    nv = jnp.asarray(np.maximum(block.var(axis=1), 1e-4))
    return x, y, nv


def test_warm_time_stride_one_equals_scratch(rng):
    """time_stride=1 is the degenerate case: identical trajectory to a
    scratch fit of coarse+fine total steps."""
    x, y, nv = _time_workload(rng)
    p_scratch, l_scratch = gp_ops.fit_gp_batch(x, y, nv, n_optim_nits=30)
    p_warm, l_warm = gp_ops.fit_gp_batch_warm_time(
        x, y, nv, time_stride=1, coarse_steps=20, fine_steps=10
    )
    for a, b in zip(jax.tree.leaves(p_scratch), jax.tree.leaves(p_warm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(l_scratch), np.asarray(l_warm), rtol=0, atol=0
    )


def test_warm_time_validation(rng):
    x, y, nv = _time_workload(rng, m=1, t=16)
    with pytest.raises(ValueError, match="time_stride"):
        gp_ops.fit_gp_batch_warm_time(x, y, nv, time_stride=0)
    with pytest.raises(ValueError, match="fine_steps"):
        gp_ops.fit_gp_batch_warm_time(x, y, nv, time_stride=4, fine_steps=0)


def test_fit_dispatch_contract(rng):
    """fit_gp_batch_dispatch is the one owner of the option contract: every
    invalid combination raises loudly instead of silently running scratch
    (or the unbounded merged fit)."""
    x, y, nv = _time_workload(rng, m=1, t=16)
    with pytest.raises(ValueError, match="time_stride"):
        gp_ops.fit_gp_batch_dispatch(x, y, nv, time_stride=0)
    with pytest.raises(ValueError, match="fine_steps"):
        gp_ops.fit_gp_batch_dispatch(x, y, nv, time_stride=2)
    with pytest.raises(ValueError, match="fine_steps"):
        # fine_steps without a stride must not be silently ignored
        gp_ops.fit_gp_batch_dispatch(x, y, nv, fine_steps=5)
    with pytest.raises(ValueError, match="chunk_steps"):
        # chunk_steps=0 must reach the chunked fit's loud error, not fall
        # through to the unbounded merged fit
        gp_ops.fit_gp_batch_dispatch(x, y, nv, n_optim_nits=3, chunk_steps=0)
    # the valid scratch route is exactly fit_gp_batch — same params AND the
    # same step sequence (loss traces bitwise equal)
    p_d, l_d = gp_ops.fit_gp_batch_dispatch(x, y, nv, n_optim_nits=5)
    p_s, l_s = gp_ops.fit_gp_batch(x, y, nv, n_optim_nits=5)
    for a, b in zip(jax.tree.leaves(p_d), jax.tree.leaves(p_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    np.testing.assert_array_equal(np.asarray(l_d), np.asarray(l_s))


def test_emulate_batch_chunked_zero_chunk_raises(rng):
    from bayesian_ensembling_tpu.models.gp_dtw import emulate_batch_chunked

    block = jnp.asarray(rng.normal(size=(1, 2, 12)).astype(np.float32))
    mask = jnp.ones((1, 2), bool)
    with pytest.raises(ValueError, match="chunk_steps"):
        emulate_batch_chunked(block, mask, n_optim_nits=3, fit_chunk_steps=0)


def test_warm_time_beats_scratch_at_same_fine_budget(rng):
    """The adoption contract: coarse(stride)+fine(k) lands closer to the
    converged optimum than scratch(k) — the warm start is doing real work
    at the full resolution the fine pass runs at."""
    x, y, nv = _time_workload(rng, m=3, t=96)
    fine = 40
    p_truth, _ = gp_ops.fit_gp_batch(x, y, nv, n_optim_nits=3000)
    m_truth = gp_ops.posterior_marginals_batch(p_truth, x, y, nv)
    p_scratch, _ = gp_ops.fit_gp_batch(x, y, nv, n_optim_nits=fine)
    p_warm, _ = gp_ops.fit_gp_batch_warm_time(
        x, y, nv, time_stride=4, coarse_steps=300, fine_steps=fine
    )

    def dist(params):
        m, v = gp_ops.posterior_marginals_batch(params, x, y, nv)
        return max(
            float(np.abs(np.asarray(m) - np.asarray(m_truth[0])).max()),
            float(np.abs(np.asarray(v) - np.asarray(m_truth[1])).max()),
        )

    assert dist(p_warm) <= dist(p_scratch), (dist(p_warm), dist(p_scratch))


def test_warm_time_chunked_fine_equals_merged(rng):
    """chunk_steps bounds each fine-pass execution without changing the
    result (the chunked fit is literally the merged scan's body)."""
    x, y, nv = _time_workload(rng, m=2, t=48)
    p_merged, l_merged = gp_ops.fit_gp_batch_warm_time(
        x, y, nv, time_stride=4, coarse_steps=25, fine_steps=20
    )
    p_chunk, l_chunk = gp_ops.fit_gp_batch_warm_time(
        x, y, nv, time_stride=4, coarse_steps=25, fine_steps=20, chunk_steps=7
    )
    for a, b in zip(jax.tree.leaves(p_merged), jax.tree.leaves(p_chunk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(l_merged), np.asarray(l_chunk), rtol=0, atol=1e-5
    )


def test_emulate_marginals_warm_time_plumbing(rng):
    """parallel/step.emulate_marginals: stride-1 path unchanged; stride>1
    requires fine_steps and produces finite marginals."""
    block = jnp.asarray(rng.normal(size=(2, 3, 40)).astype(np.float32))
    mask = jnp.ones((2, 3), bool)
    base = emulate_marginals(block, mask, n_optim_nits=15)
    same = emulate_marginals(
        block, mask, n_optim_nits=15, time_stride=1, fine_steps=None
    )
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(same[0]), atol=0)
    with pytest.raises(ValueError, match="fine_steps"):
        emulate_marginals(block, mask, n_optim_nits=15, time_stride=2)
    mu, var = emulate_marginals(
        block, mask, n_optim_nits=15, time_stride=2, fine_steps=5
    )
    assert np.isfinite(np.asarray(mu)).all()
    assert (np.asarray(var) > 0).all()


def test_gpdtw1d_fit_collection_warm_time(rng):
    """Model-level surface: GPDTW1D.fit_collection(time_stride=, fine_steps=)
    runs end-to-end and attaches finite posteriors."""
    from bayesian_ensembling_tpu.coords import DimArray
    from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
    from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D

    t = 36
    time = np.arange(np.datetime64("2000-01"), np.datetime64("2003-01"))
    pms = []
    for i in range(2):
        vals = (np.sin(np.linspace(0, 4, t)) +
                0.2 * rng.normal(size=(3, t))).astype(np.float32)
        da = DimArray(vals, dims=("realisation", "time"),
                      coords={"realisation": np.arange(3), "time": time})
        pms.append(ProcessModel(da, f"m{i}"))
    mc = ModelCollection(pms)
    mc.fit(GPDTW1D(), n_optim_nits=20, time_stride=3, fine_steps=8)
    for pm in mc:
        assert np.isfinite(np.asarray(pm.posterior.gaussian.mean)).all()


def test_pmt_forwards_warm_time_fit_kwargs(rng):
    """PerfectModelTest.run(**fit_kwargs) forwards time_stride/fine_steps
    into every per-fold fit (the fresh-fit monthly PMT path)."""
    import bayesian_ensembling_tpu as bet
    from test_weights_extra import make_collection

    hind = make_collection(rng, n_models=3, n_reals=(2,), n_months=14)
    fore = make_collection(rng, n_models=3, n_reals=(2,), n_months=14)
    pmt = bet.PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=bet.GPDTW1D,
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="warm",
        save_dir=None,
    )
    df = pmt.run(n_optim_nits=5, time_stride=2, fine_steps=3)
    assert len(df) == 3
    assert np.isfinite(df.iloc[:, 1:].to_numpy(dtype=float)).all()


def test_oracle_subset_coarse_params_identical(rng):
    """Fitting only the coarse cells a subset needs gives the SAME params as
    a full coarse pass (per-cell independence) — what lets the CPU oracle
    reproduce the bench's warm algorithm on its first-N cells."""
    import sys, os

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    )
    import gridded_common as gc

    la, lo, stride, nits = 4, 6, 2, 40
    full = gc.coarse_params_for(np.arange(la * lo), la, lo, stride, nits,
                                np.float64)
    sub = gc.coarse_params_for(np.arange(5), la, lo, stride, nits, np.float64)
    for p, q in zip(jax.tree.leaves(full), jax.tree.leaves(sub)):
        np.testing.assert_allclose(p[:, :5], q, rtol=0, atol=0)
