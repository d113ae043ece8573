"""Plumbing test for the matched-hyperparameter parity oracle (VERDICT r3 #4).

Drives benchmarks/matched_hparams_oracle.py end-to-end at toy scale: a
"production" run exports converged hyperparameters + DBA targets, the
oracle subprocess recomputes the pipeline in f64 CPU, and the two must
agree pointwise to float-rounding level (the real-workload gate lives in
bench.py as ``parity_matched_targets``/``parity_matched_hparams``).
"""

import functools
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "benchmarks", "matched_hparams_oracle.py")


def test_matched_hparams_oracle_round_trip(rng, tmp_path):
    from bayesian_ensembling_tpu.ops.gp import prepare_gp_inputs
    from bayesian_ensembling_tpu.parallel.step import (
        emulate_marginals,
        multi_scenario_tail,
    )

    s, m, r, t_hist, t_ssp, r_obs = 2, 3, 4, 14, 8, 5
    hb = rng.normal(size=(s, m, r, t_hist)).astype(np.float32)
    hm = np.ones((s, m, r), bool)
    sb = rng.normal(size=(s, m, r, t_ssp)).astype(np.float32)
    sm = np.ones((s, m, r), bool)
    obs = rng.normal(size=(r_obs, t_hist)).astype(np.float32)
    mmask = np.ones((s, m), np.float32)

    dba_iters = 2
    em = jax.jit(
        functools.partial(
            emulate_marginals, n_optim_nits=5, dba_iterations=dba_iters,
            return_params=True,
        )
    )
    prep = jax.jit(
        functools.partial(prepare_gp_inputs, dba_iterations=dba_iters)
    )
    hbf = jnp.asarray(hb).reshape(s * m, r, t_hist)
    hmf = jnp.asarray(hm).reshape(s * m, r)
    sbf = jnp.asarray(sb).reshape(s * m, r, t_ssp)
    smf = jnp.asarray(sm).reshape(s * m, r)
    h_mu, h_var, hp = em(hbf, hmf)
    s_mu, s_var, sp = em(sbf, smf)
    _, h_ym, h_yv = prep(hbf, hmf)
    _, s_ym, s_yv = prep(sbf, smf)
    t_bm, t_bs, _ = jax.jit(multi_scenario_tail)(
        h_mu.reshape(s, m, t_hist), h_var.reshape(s, m, t_hist),
        s_mu.reshape(s, m, t_ssp), s_var.reshape(s, m, t_ssp),
        jnp.asarray(obs), jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(mmask),
    )

    inp = str(tmp_path / "in.npz")
    outp = str(tmp_path / "out.npz")
    np.savez(
        inp,
        hb=hb, hm=hm, sb=sb, sm=sm, obs=obs, mmask=mmask,
        dba_iterations=dba_iters,
        hist_raw_lengthscale=np.asarray(hp.raw_lengthscale),
        hist_raw_variance=np.asarray(hp.raw_variance),
        ssp_raw_lengthscale=np.asarray(sp.raw_lengthscale),
        ssp_raw_variance=np.asarray(sp.raw_variance),
        hist_y_mean=np.asarray(h_ym), hist_y_var=np.asarray(h_yv),
        ssp_y_mean=np.asarray(s_ym), ssp_y_var=np.asarray(s_yv),
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, ORACLE, inp, outp],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    z = np.load(outp)

    tb_m = np.asarray(t_bm, np.float64)
    tb_s = np.asarray(t_bs, np.float64)
    # The production side ingests f32 arrays (f32 compute even under the
    # test harness's x64 flag), the oracle recomputes in f64 — so the
    # agreement level IS the f32 computation-parity claim the bench gate
    # makes (1e-5); measured ~1e-7 at this scale.
    assert np.abs(tb_m - z["targets_bary_mean"]).max() < 1e-5
    assert np.abs(tb_s - z["targets_bary_std"]).max() < 1e-5
    assert np.abs(tb_m - z["hparams_bary_mean"]).max() < 1e-5
    assert np.abs(tb_s - z["hparams_bary_std"]).max() < 1e-5
