"""The gridded bench's slab driver (``gridded_bench.slabbed_run``) must be a
pure dispatch strategy: streaming and resident modes, any slab size up to
the cell count, and the padded ragged final slab all have to reproduce the
unslabbed result exactly, and the warm-start init tree must be sliced in
lockstep with the cells (staged on-device under ``resident``).  Slabs larger
than the grid are rejected loudly — the head-wrap pad would silently
truncate there; callers want the unslabbed path instead.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"
    ),
)

from gridded_bench import slabbed_run  # noqa: E402

M, C, R, T = 3, 13, 4, 8


def _workload():
    rng = np.random.default_rng(7)
    block = rng.normal(size=(M, C, R, T)).astype(np.float32)
    obs = rng.normal(size=(C, R, T)).astype(np.float32)
    return block, obs


@jax.jit
def _step(b, o):
    # Cheap stand-in with cell-dependent outputs of the real step's shape
    # ((C, T) mean/std with the cell axis leading).
    return b.mean(axis=(0, 2)) + o.mean(axis=1), b.std(axis=(0, 2))


@jax.jit
def _step_init(b, o, g):
    m, s = _step(b, o)
    return m + g["off"].mean(axis=0)[:, None], s * g["scale"].mean(axis=0)[:, None]


def _direct(step, block, obs, gp_init=None):
    args = (jnp.asarray(block), jnp.asarray(obs))
    out = step(*args, gp_init) if gp_init is not None else step(*args)
    return np.asarray(out[0], np.float64), np.asarray(out[1], np.float64)


@pytest.mark.parametrize("slab", [4, 5, 13])  # 13 % 4 != 0 exercises the pad
@pytest.mark.parametrize("resident", [False, True])
def test_slabbed_matches_direct(slab, resident):
    block, obs = _workload()
    want_m, want_s = _direct(_step, block, obs)
    kw = {}
    if resident:
        kw = dict(block_dev=jax.device_put(block), obs_dev=jax.device_put(obs))
    got_m, got_s = slabbed_run(
        _step, block, obs, slab, resident=resident, **kw
    )
    np.testing.assert_array_equal(got_m, want_m)
    np.testing.assert_array_equal(got_s, want_s)


def test_slab_larger_than_grid_rejected():
    block, obs = _workload()
    with pytest.raises(ValueError, match="slab"):
        slabbed_run(_step, block, obs, C + 1)


@pytest.mark.parametrize("resident", [False, True])
def test_slabbed_slices_gp_init_with_cells(resident):
    block, obs = _workload()
    rng = np.random.default_rng(8)
    gp_init = {
        "off": rng.normal(size=(M, C)).astype(np.float32),
        "scale": rng.uniform(0.5, 2.0, size=(M, C)).astype(np.float32),
    }
    want_m, want_s = _direct(_step_init, block, obs, gp_init)
    kw = {}
    if resident:
        kw = dict(block_dev=jax.device_put(block), obs_dev=jax.device_put(obs))
    got_m, got_s = slabbed_run(
        _step_init, block, obs, 5, gp_init=gp_init, resident=resident, **kw
    )
    np.testing.assert_array_equal(got_m, want_m)
    np.testing.assert_array_equal(got_s, want_s)


# ---------------------------------------------------------------------------
# --gate quality (gridded_bench.quality_gate_check): closeness to the f64
# converged-truth oracle entry, gated against the scratch-500 baseline
# entry's own closeness.


def _fake_oracle(nc=4, t=6):
    rng = np.random.default_rng(3)
    truth_m = rng.normal(size=(nc, t))
    truth_s = rng.uniform(0.5, 1.0, size=(nc, t))
    base_m = truth_m + 0.05  # baseline sits 5e-2 from truth everywhere
    base_s = truth_s + 0.02
    return {
        "entries": [
            {"n_optim_nits": 2000, "n_cells": nc, "warm_stride": 0,
             "optimizer": "adam", "bary_mean": truth_m.tolist(),
             "bary_std": truth_s.tolist()},
            {"n_optim_nits": 500, "n_cells": nc, "warm_stride": 0,
             "optimizer": "adam", "bary_mean": base_m.tolist(),
             "bary_std": base_s.tolist()},
        ]
    }, truth_m, truth_s


def test_quality_gate_passes_closer_than_baseline():
    from gridded_bench import quality_gate_check

    loaded, tm, ts = _fake_oracle()
    qm, qs = quality_gate_check(
        loaded, tm + 0.01, ts + 0.01, n_cells=100, lat=10, lon=10
    )
    assert abs(qm - 0.01) < 1e-12 and abs(qs - 0.01) < 1e-12


def test_quality_gate_rejects_worse_than_baseline():
    from gridded_bench import quality_gate_check

    loaded, tm, ts = _fake_oracle()
    # SystemExit (survives python -O), not assert — ADVICE r3.
    with pytest.raises(SystemExit, match="quality gate"):
        quality_gate_check(loaded, tm + 0.2, ts, n_cells=100, lat=10, lon=10)


def test_quality_gate_slack_tolerates_marginal_config():
    """A run sitting *exactly* at baseline quality (or a hair over) passes:
    the gate carries a small relative slack so marginal configs cannot flap
    on f32 scatter across compiler versions (ADVICE r3)."""
    from gridded_bench import quality_gate_check

    loaded, tm, ts = _fake_oracle()
    # baseline closeness is 0.05 mean / 0.02 std; 1% over still passes the
    # default 2% slack, 5% over does not.
    qm, _ = quality_gate_check(
        loaded, tm + 0.0505, ts + 0.02, n_cells=100, lat=10, lon=10
    )
    assert abs(qm - 0.0505) < 1e-12
    with pytest.raises(SystemExit, match="quality gate"):
        quality_gate_check(
            loaded, tm + 0.0525, ts + 0.02, n_cells=100, lat=10, lon=10
        )


def test_quality_gate_missing_entries_is_loud():
    from gridded_bench import quality_gate_check

    loaded, tm, ts = _fake_oracle()
    loaded["entries"] = loaded["entries"][:1]  # drop the baseline entry
    with pytest.raises(SystemExit, match="gate quality"):
        quality_gate_check(loaded, tm, ts, n_cells=100, lat=10, lon=10)


def test_quality_gate_smaller_grid_than_oracle_hints():
    """Entries exist but this run's grid is SMALLER than the oracle subset:
    the message must say so instead of claiming the entries are missing
    (ADVICE r3)."""
    from gridded_bench import quality_gate_check

    loaded, tm, ts = _fake_oracle()  # entries carry n_cells=4
    with pytest.raises(SystemExit, match="exceed this run's 2 cells"):
        quality_gate_check(loaded, tm[:2], ts[:2], n_cells=2, lat=1, lon=2)


@pytest.mark.parametrize("slab", [4, 13])
def test_streamed_matches_direct(slab):
    # --stream (background double-buffered staging) is a dispatch
    # strategy like the others: bit-identical outputs, ragged pad
    # included.
    block, obs = _workload()
    want_m, want_s = _direct(_step, block, obs)
    got_m, got_s = slabbed_run(_step, block, obs, slab, stream=True)
    np.testing.assert_array_equal(got_m, want_m)
    np.testing.assert_array_equal(got_s, want_s)


def test_streamed_collect_fit_matches_default():
    # The refine path's fit products assemble identically under stream
    # staging (cell-axis concat across slabs, pad sliced).
    block, obs = _workload()

    @jax.jit
    def step6(b, o):
        m, s = _step(b, o)
        w = b.mean(axis=(2, 3))
        params = {"p": b.sum(axis=(2, 3))}  # (M, C) leaf
        ym = b.mean(axis=2)  # (M, C, T)
        yv = b.var(axis=2)
        return m, s, w, params, ym, yv

    d_m, d_s, d_p, d_ym, d_yv = slabbed_run(
        step6, block, obs, 4, collect_fit=True
    )
    s_m, s_s, s_p, s_ym, s_yv = slabbed_run(
        step6, block, obs, 4, collect_fit=True, stream=True
    )
    np.testing.assert_array_equal(d_m, s_m)
    np.testing.assert_array_equal(d_p["p"], s_p["p"])
    np.testing.assert_array_equal(d_ym, s_ym)
    np.testing.assert_array_equal(d_yv, s_yv)
    # And the assembled products equal the direct (unslabbed) fit.
    out = step6(jnp.asarray(block), jnp.asarray(obs))
    np.testing.assert_array_equal(np.asarray(out[3]["p"]), d_p["p"])
    np.testing.assert_array_equal(np.asarray(out[4]), d_ym)


def test_stream_resident_mutually_exclusive():
    block, obs = _workload()
    with pytest.raises(ValueError, match="mutually exclusive"):
        slabbed_run(
            _step, block, obs, 4, stream=True, resident=True,
            block_dev=jnp.asarray(block), obs_dev=jnp.asarray(obs),
        )


def test_stream_staging_failure_surfaces():
    # A staging-thread crash must raise in the caller, not hang the queue.
    block, obs = _workload()

    class Boom:  # breaks the producer's host slice
        shape = block.shape
        def __getitem__(self, *_):
            raise RuntimeError("staged boom")
    with pytest.raises(RuntimeError, match="staged boom"):
        slabbed_run(_step, Boom(), obs, 4, stream=True)


def test_cached_workload_bit_identical(tmp_path):
    import gridded_common as gc

    want_b, want_o = gc.make_workload(10)
    got_b, got_o = gc.make_workload_cached(
        10, cache_dir=str(tmp_path), gen_chunk=4
    )
    np.testing.assert_array_equal(np.asarray(got_b), want_b)
    np.testing.assert_array_equal(np.asarray(got_o), want_o)
    # Cache hit returns the same bytes without regeneration.
    again_b, again_o = gc.make_workload_cached(10, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(again_b), want_b)
    np.testing.assert_array_equal(np.asarray(again_o), want_o)
