"""Float64 posterior refinement at f32-converged hyperparameters.

``parallel/step.refined_multi_scenario_f64`` removes the f32 solve-scatter
floor from the published barycentre moments while keeping the fit in f32
(BASELINE.json's 1e-5 parity line on the real workload; bench.py
``parity_matched_refined``).  Contract tested here:

* the refined tail equals an explicit f64 recompute at the same
  hyperparameters and f32 DBA targets to ~1e-12 (same math, same dtype);
* the refinement changes the f32 tail only at the f32 scatter scale;
* the linalg dispatch routes non-f32 inputs off the f32-only Pallas/blocked
  kernels on TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_ensembling_tpu.ops import gp as gp_ops
from bayesian_ensembling_tpu.ops import linalg_pallas as lp
from bayesian_ensembling_tpu.parallel.step import (
    emulate_marginals,
    multi_scenario_tail,
    refined_multi_scenario_f64,
)


def _workload(rng, s=2, m=3, r=4, t_hist=24, t_ssp=12):
    hb = (rng.normal(size=(s, m, r, t_hist)).astype(np.float32).cumsum(-1) * 0.1)
    sb = (rng.normal(size=(s, m, r, t_ssp)).astype(np.float32).cumsum(-1) * 0.1)
    hm = np.ones((s, m, r), np.float32)
    sm = np.ones((s, m, r), np.float32)
    mmask = np.ones((s, m), np.float32)
    obs = rng.normal(size=(5, t_hist)).astype(np.float32).cumsum(-1) * 0.1
    return hb, hm, sb, sm, obs, mmask


def test_refined_matches_explicit_f64_recompute(rng):
    hb, hm, sb, sm, obs, mmask = _workload(rng)
    s, m, r, t_hist = hb.shape
    t_ssp = sb.shape[-1]
    em = jax.jit(
        functools.partial(emulate_marginals, n_optim_nits=20, return_params=True)
    )
    h_mu, h_var, hp = em(
        jnp.asarray(hb).reshape(s * m, r, t_hist),
        jnp.asarray(hm).reshape(s * m, r),
    )
    s_mu, s_var, sp = em(
        jnp.asarray(sb).reshape(s * m, r, t_ssp),
        jnp.asarray(sm).reshape(s * m, r),
    )

    rbm, rbs, rw = refined_multi_scenario_f64(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), jnp.asarray(mmask), hp, sp,
    )
    assert rbm.dtype == np.float64 and rbs.dtype == np.float64
    assert np.isfinite(rbm).all() and np.isfinite(rbs).all()

    # Explicit f64 recompute: same f32 targets, f64 marginals + tail —
    # mirrors benchmarks/matched_hparams_oracle.py mode 2.
    def marginals(params, block):
        x, ym, yv = gp_ops.prepare_gp_inputs(
            jnp.asarray(block, jnp.float32).reshape(-1, r, block.shape[-1]),
            jnp.asarray(np.ones((block.shape[0] * block.shape[1], r), np.float32)),
        )
        p64 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), params)
        mu, var = gp_ops.posterior_marginals_batch(
            p64,
            jnp.asarray(x, jnp.float64),
            jnp.asarray(ym, jnp.float64),
            jnp.asarray(yv, jnp.float64),
        )
        return mu, var + jnp.asarray(yv, jnp.float64)

    h_mu2, h_var2 = marginals(hp, hb)
    s_mu2, s_var2 = marginals(sp, sb)
    bm2, bs2, _ = multi_scenario_tail(
        h_mu2.reshape(s, m, t_hist), h_var2.reshape(s, m, t_hist),
        s_mu2.reshape(s, m, t_ssp), s_var2.reshape(s, m, t_ssp),
        jnp.asarray(obs, jnp.float64), jnp.asarray(hb, jnp.float64),
        jnp.asarray(hm, jnp.float64), jnp.asarray(mmask, jnp.float64),
    )
    np.testing.assert_allclose(rbm, np.asarray(bm2), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(rbs, np.asarray(bs2), rtol=1e-10, atol=1e-12)

    # The f32 tail agrees with the refined one at the f32 scatter scale —
    # refinement is a precision upgrade, not an algorithm change.
    bm32, bs32, _ = jax.jit(multi_scenario_tail)(
        h_mu.reshape(s, m, t_hist), h_var.reshape(s, m, t_hist),
        s_mu.reshape(s, m, t_ssp), s_var.reshape(s, m, t_ssp),
        jnp.asarray(obs), jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(mmask),
    )
    assert float(np.abs(np.asarray(bm32, np.float64) - rbm).max()) < 1e-3
    assert float(np.abs(np.asarray(bs32, np.float64) - rbs).max()) < 1e-3


def test_fit_collection_refine_f64(rng):
    # Container-level surface: GPDTW1D(..., refine_f64=True) publishes f64
    # moments from the f32 fit; equal to refine_posterior_f64 on the same
    # params, near the f32 posterior, SPD covariance.
    from test_data import make_collection

    from bayesian_ensembling_tpu.models.gp_dtw import (
        GPDTW1D,
        emulate_batch,
        refine_posterior_f64,
    )

    mc = make_collection(rng, n_models=3, n_reals=(2, 4, 3), n_months=30)
    f32 = GPDTW1D(dtype=np.float32)
    posts32 = f32.fit_collection(mc, n_optim_nits=30, dba_iterations=3)
    posts64 = f32.fit_collection(
        mc, n_optim_nits=30, dba_iterations=3, refine_f64=True
    )
    block, mask = mc.padded_stack(dtype=np.dtype(np.float32))
    _, _, _, params, ym, yv = emulate_batch(
        jnp.asarray(block), jnp.asarray(mask),
        n_optim_nits=30, dba_iterations=3, return_params=True,
    )
    rm, rc = refine_posterior_f64(
        jnp.asarray(block), jnp.asarray(mask), params, dba_iterations=3
    )
    # The fit's own targets and the recomputed-preamble path agree exactly.
    rm_t, rc_t = refine_posterior_f64(
        jnp.asarray(block), jnp.asarray(mask), params, dba_iterations=3,
        targets=(ym, yv),
    )
    np.testing.assert_array_equal(rm, rm_t)
    np.testing.assert_array_equal(rc, rc_t)
    # device="cpu" (native-f64 host pass) computes the same refinement.
    rm_c, rc_c = refine_posterior_f64(
        jnp.asarray(block), jnp.asarray(mask), params, dba_iterations=3,
        targets=(ym, yv), device="cpu",
    )
    np.testing.assert_allclose(rm_c, rm, rtol=1e-12)
    np.testing.assert_allclose(rc_c, rc, rtol=1e-10, atol=1e-14)
    for i, (p32, p64) in enumerate(zip(posts32, posts64)):
        g = p64.gaussian
        assert np.asarray(g.mean).dtype == np.float64
        np.testing.assert_allclose(np.asarray(g.mean), rm[i], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g.cov), rc[i], rtol=1e-10, atol=1e-14)
        # Precision upgrade, not an algorithm change.
        assert float(
            np.abs(np.asarray(p32.gaussian.mean, np.float64) - rm[i]).max()
        ) < 1e-3
        # SPD: the refined covariance supports sampling/Cholesky.
        np.linalg.cholesky(rc[i] + 1e-10 * np.eye(rc[i].shape[0]))


def test_linalg_path_routes_f64_to_xla():
    # T=165 fits the Pallas VMEM budget in f32 — but the kernels are
    # f32-only, so f64 must take XLA (whose TPU f64 is emulated but exact).
    assert lp.linalg_path(165, backend="tpu") == "pallas"
    assert lp.linalg_path(165, backend="tpu", dtype=np.float64) == "xla"
    assert lp.linalg_path(165, backend="tpu", dtype=np.float32) == "pallas"
    # The blocked hybrid's diagonal blocks are Pallas too: f64 disables it.
    assert lp.linalg_path(1032, backend="tpu", b=112) == "blocked"
    assert lp.linalg_path(1032, backend="tpu", b=112, dtype=np.float64) == "xla"
    # CPU unaffected.
    assert lp.linalg_path(165, backend="cpu", dtype=np.float64) == "xla"


# ---------------------------------------------------------------- gridded
# VERDICT r4: the gridded artifacts were the last surface still carrying
# f32 solve scatter; parallel/gridded.refine_marginals_f64 /
# refined_gridded_f64 close it.


def _gridded_workload(rng, m=3, c=6, r=4, t=20):
    sig = np.sin(np.linspace(0, 3, t)).astype(np.float32)
    block = (sig + 0.3 * rng.normal(size=(m, c, r, t))).astype(np.float32)
    obs = (sig + 0.3 * rng.normal(size=(c, r, t))).astype(np.float32)
    mask = np.ones((m, c, r), bool)
    return block, obs, mask


def test_refined_gridded_matches_explicit_f64_recompute(rng):
    from bayesian_ensembling_tpu.parallel.gridded import (
        gridded_ensemble_step,
        gridded_tail,
        refined_gridded_f64,
    )

    block, obs, mask = _gridded_workload(rng)
    m, c, r, t = block.shape
    step = jax.jit(
        functools.partial(
            gridded_ensemble_step, n_optim_nits=25, return_fit=True
        )
    )
    bm, bs, w, params, ym, yv = step(
        jnp.asarray(block), jnp.asarray(obs), jnp.asarray(mask)
    )
    rbm, rbs, rw = refined_gridded_f64(
        block, obs, mask, params, (ym, yv)
    )
    assert rbm.dtype == np.float64 and rbs.dtype == np.float64
    assert np.isfinite(rbm).all() and np.isfinite(rbs).all()

    # Explicit f64 recompute, assembled independently in-test: f64
    # marginals at the f32 params/targets + the f64 tail.
    x = np.swapaxes(block.reshape(m * c, r, t), 1, 2)
    p64 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a).reshape(m * c), jnp.float64),
        params,
    )
    mu, var = gp_ops.posterior_marginals_batch(
        p64,
        jnp.asarray(x, jnp.float64),
        jnp.asarray(np.asarray(ym).reshape(m * c, t), jnp.float64),
        jnp.asarray(np.asarray(yv).reshape(m * c, t), jnp.float64),
    )
    var = var + jnp.asarray(np.asarray(yv).reshape(m * c, t), jnp.float64)
    bm2, bs2, _ = gridded_tail(
        mu.reshape(m, c, t), var.reshape(m, c, t),
        jnp.asarray(obs, jnp.float64), jnp.asarray(block, jnp.float64),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(rbm, np.asarray(bm2), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(rbs, np.asarray(bs2), rtol=1e-10, atol=1e-12)

    # Precision upgrade, not an algorithm change.
    assert float(np.abs(np.asarray(bm, np.float64) - rbm).max()) < 1e-3
    assert float(np.abs(np.asarray(bs, np.float64) - rbs).max()) < 1e-3
    assert float(np.abs(np.asarray(w, np.float64) - rw).max()) < 1e-2


def test_refined_gridded_chunking_and_device(rng):
    from bayesian_ensembling_tpu.parallel.gridded import (
        gridded_ensemble_step,
        refined_gridded_f64,
    )

    block, obs, mask = _gridded_workload(rng, c=7)
    step = jax.jit(
        functools.partial(
            gridded_ensemble_step, n_optim_nits=20, return_fit=True
        )
    )
    _, _, _, params, ym, yv = step(
        jnp.asarray(block), jnp.asarray(obs), jnp.asarray(mask)
    )
    full = refined_gridded_f64(block, obs, mask, params, (ym, yv))
    # Chunked (with a ragged, padded final chunk) == unchunked, exactly.
    chunked = refined_gridded_f64(
        block, obs, mask, params, (ym, yv), cell_chunk=3
    )
    for a, b in zip(full, chunked):
        np.testing.assert_array_equal(a, b)
    # device="cpu" computes the same refinement (native host f64).
    on_cpu = refined_gridded_f64(
        block, obs, mask, params, (ym, yv), device="cpu"
    )
    for a, b in zip(full, on_cpu):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-13)


def test_gridded_step_return_fit_consistency(rng):
    # return_fit must not change the computed moments, and the returned
    # params/targets must reproduce the step's own marginals.
    from bayesian_ensembling_tpu.parallel.gridded import gridded_ensemble_step

    block, obs, mask = _gridded_workload(rng)
    plain = jax.jit(
        functools.partial(gridded_ensemble_step, n_optim_nits=15)
    )(jnp.asarray(block), jnp.asarray(obs), jnp.asarray(mask))
    fitted = jax.jit(
        functools.partial(
            gridded_ensemble_step, n_optim_nits=15, return_fit=True
        )
    )(jnp.asarray(block), jnp.asarray(obs), jnp.asarray(mask))
    for a, b in zip(plain, fitted[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    m, c, r, t = block.shape
    assert jax.tree_util.tree_leaves(fitted[3])[0].shape == (m, c)
    assert fitted[4].shape == (m, c, t) and fitted[5].shape == (m, c, t)


def test_emulate_marginals_return_targets_contract(rng):
    from bayesian_ensembling_tpu.parallel.step import emulate_marginals

    block = rng.normal(size=(2, 3, 12)).astype(np.float32)
    mask = np.ones((2, 3), bool)
    with np.testing.assert_raises(ValueError):
        emulate_marginals(
            jnp.asarray(block), jnp.asarray(mask), n_optim_nits=1,
            return_targets=True,
        )


def _gridded_collection(rng, n_models=3):
    from test_gp3d import make_gridded

    from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel

    return ModelCollection(
        [
            ProcessModel(make_gridded(rng).data, f"model{i}")
            for i in range(n_models)
        ]
    )


def test_gp3d_refine_f64(rng):
    # Library surface: GPDTW3D(batched).fit(refine_f64=True) publishes f64
    # diagonal posteriors; svgp mode refuses the flag loudly.
    from bayesian_ensembling_tpu.models.gp_3d import GPDTW3D

    mc = _gridded_collection(rng)
    posts32 = GPDTW3D(mode="batched").fit_collection(
        mc, n_optim_nits=15, dba_iterations=2
    )
    posts64 = GPDTW3D(mode="batched").fit_collection(
        mc, n_optim_nits=15, dba_iterations=2, refine_f64=True,
        refine_cell_chunk=3,
    )
    for p32, p64 in zip(posts32, posts64):
        g = p64.gaussian
        assert np.asarray(g.mean).dtype == np.float64
        assert np.asarray(g.var).dtype == np.float64
        assert (np.asarray(g.var) > 0).all()
        assert float(
            np.abs(np.asarray(p32.gaussian.mean, np.float64) - np.asarray(g.mean)).max()
        ) < 1e-3
    import pytest

    with pytest.raises(ValueError, match="batched mode"):
        GPDTW3D(mode="svgp").fit_collection(
            mc, n_optim_nits=1, dba_iterations=1, refine_f64=True
        )


def test_run_gridded_scenario_refine_f64(rng):
    from bayesian_ensembling_tpu import pipeline

    mc = _gridded_collection(rng)
    obs = mc[0]
    w32, bary32 = pipeline.run_gridded_scenario(
        mc, obs, n_optim_nits=10, dba_iterations=2
    )
    w64, bary64 = pipeline.run_gridded_scenario(
        mc, obs, n_optim_nits=10, dba_iterations=2, refine_f64=True
    )
    m64 = np.asarray(bary64.gaussian.mean)
    assert m64.dtype == np.float64
    assert np.isfinite(m64).all()
    assert float(
        np.abs(np.asarray(bary32.gaussian.mean, np.float64) - m64).max()
    ) < 1e-3
