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
