"""Coarse-to-fine IN TIME: warm-start monthly GP fits from a stride-12 fit.

The gridded experiment's biggest round-3 win was coarse-to-fine in SPACE
(BASELINE.md "Warm-started gridded fits": neighbours' converged
hyperparameters are a better init than scratch).  This bench measures the
same idea along the TIME axis for the native-monthly campaign, whose cost
is dominated by the T = 1980 historical NLML scans: fit the SAME data
subsampled at stride 12 (annual sampling of the monthly anomalies — the
feature values keep their distribution, so the 2-scalar hyperparameter
optimum is close), then run only a short fine pass at full T.

The coarse fit at T = 165 runs in the batch-in-lanes Pallas regime
(~milliseconds per step); the fine pass at T = 1980 goes through XLA's
blocked decompositions at ~30 ms/step — so every fine step saved is the
whole win.

Quality gate mirrors tests/test_warm_start.py's contract: each variant's
posterior marginals are compared against a CONVERGED truth (2000 monthly
steps, run host-chunked to stay under the execution watchdog); a warm
variant is adoptable only if it is at least as close to the truth as the
scratch-500 production setting while spending materially less monthly-T
compute.

Data: the dedup campaign's unique historical models (one per distinct CMIP6
model across all 7 SSPs — the same ~20 fits run_all_ssps(dedup=True) pays
for; reference workload shapes from experiments/data/gmst/).

Usage: python benchmarks/monthly_warm_bench.py [fine_steps_csv] [stride] [bfgs_csv]
       (defaults: 50,100,250  12  20,40 — bfgs_csv are scratch step counts
        for the per-model damped quasi-Newton candidates, '' = skip; a
        combined coarse-bfgs + fine-bfgs variant runs alongside)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def unique_hist_models():
    """Union of historical models across all 7 SSP collections, one row per
    distinct model name (anomalies are scenario-independent — the same
    invariant run_all_ssps(dedup=True) asserts at pack time)."""
    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.data import ModelCollection

    uniq = {}
    for ssp in pipeline.ALL_SSPS:
        hist, _ = pipeline.load_scenario(ssp, resample_freq=None)
        for pm in hist:
            if pm.name not in uniq:
                uniq[pm.name] = pm
            else:
                # The invariant dedup rests on, asserted like
                # monthly_bench.build_all_ssps_runner does at pack time.
                assert np.array_equal(
                    uniq[pm.name].data.values, pm.data.values
                ), f"historical anomalies for {pm.name} differ between scenarios"
    return ModelCollection(list(uniq.values())).padded_stack(
        dtype=np.dtype(np.float32)
    )


def main():
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.ops import gp
    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    fine_list = [int(a) for a in (sys.argv[1] if len(sys.argv) > 1 else "50,100,250").split(",")]
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    bfgs_list = [
        int(a)
        for a in (sys.argv[3] if len(sys.argv) > 3 else "20,40").split(",")
        if a
    ]

    block_np, mask_np = unique_hist_models()
    b, r, t = block_np.shape
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"unique historical models: B={b}, R<= {r}, T={t}", file=sys.stderr)

    block = jnp.asarray(block_np)
    mask = jnp.asarray(mask_np)

    # GP inputs — the production preamble itself (ops/gp.prepare_gp_inputs,
    # the one owner shared with emulate_marginals and emulate_batch), so
    # the bench provably measures the path it claims to.
    x, y_mean, y_var = gp.prepare_gp_inputs(block, mask, dba_iterations=10)
    sync((y_mean, y_var))

    def marginals(params):
        return gp.posterior_marginals_batch(params, x, y_mean, y_var)

    # Every monthly-T fit below runs through fit_gp_batch_chunked with the
    # SAME 50-step segment, so truth, scratch, and every fine pass share
    # ONE compiled T=1980 program (the merged fit_gp_batch would compile a
    # fresh program per distinct n_optim_nits — minutes of compile for a
    # quality measurement; chunking costs ~1% at monthly T, and all
    # variants pay it identically so the wall comparison stays fair).
    def monthly_fit(nits, init=None, optimizer="adam"):
        return gp.fit_gp_batch_chunked(
            x, y_mean, y_var, n_optim_nits=nits, chunk_steps=50, init=init,
            optimizer=optimizer,
        )

    # Converged truth: 2000 monthly steps (chunking also keeps each device
    # execution far under the tunnelled chip's watchdog).
    t0 = time.perf_counter()
    p_truth, _ = monthly_fit(2000)
    m_truth, v_truth = marginals(p_truth)
    sync((m_truth, v_truth))
    print(f"truth (2000 monthly steps, chunked): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    m_truth = np.asarray(m_truth)
    s_truth = np.sqrt(np.asarray(v_truth))

    def closeness(params):
        m, v = marginals(params)
        dm = float(np.max(np.abs(np.asarray(m) - m_truth)))
        ds = float(np.max(np.abs(np.sqrt(np.asarray(v)) - s_truth)))
        return dm, ds

    rows = []

    # Production scratch setting.
    t0 = time.perf_counter()
    p_scratch, _ = monthly_fit(500)
    sync(p_scratch)
    t_scratch = time.perf_counter() - t0
    dm, ds = closeness(p_scratch)
    rows.append(("scratch(500)", t_scratch, 500, dm, ds))

    # Coarse fit once: stride-subsampled rows of the SAME arrays.
    xc, yc, nc = x[:, ::stride, :], y_mean[:, ::stride], y_var[:, ::stride]
    t0 = time.perf_counter()
    p_coarse, _ = gp.fit_gp_batch(xc, yc, nc, n_optim_nits=500)
    sync(p_coarse)
    t_coarse = time.perf_counter() - t0
    print(f"coarse (T={xc.shape[1]}, 500 steps): {t_coarse:.2f}s",
          file=sys.stderr, flush=True)

    for fine in fine_list:
        t0 = time.perf_counter()
        p_w, _ = monthly_fit(fine, init=p_coarse)
        sync(p_w)
        t_fine = time.perf_counter() - t0
        dm, ds = closeness(p_w)
        rows.append((f"warm stride-{stride}, {fine} fine", t_coarse + t_fine, fine, dm, ds))

    # Per-model damped quasi-Newton candidates (ops/gp._build_batch_step):
    # scratch at full monthly T, plus one combined coarse-bfgs + fine-bfgs.
    for nits in bfgs_list:
        t0 = time.perf_counter()
        p_b, _ = monthly_fit(nits, optimizer="bfgs")
        sync(p_b)
        t_b = time.perf_counter() - t0
        dm, ds = closeness(p_b)
        rows.append((f"bfgs {nits} (scratch)", t_b, nits, dm, ds))
    if bfgs_list:
        t0 = time.perf_counter()
        p_cb, _ = gp.fit_gp_batch(xc, yc, nc, n_optim_nits=30, optimizer="bfgs")
        sync(p_cb)
        t_cb = time.perf_counter() - t0
        t0 = time.perf_counter()
        p_wb, _ = monthly_fit(10, init=p_cb, optimizer="bfgs")
        sync(p_wb)
        t_wb = time.perf_counter() - t0
        dm, ds = closeness(p_wb)
        rows.append(
            (f"warm-bfgs stride-{stride}, c30 f10", t_cb + t_wb, 10, dm, ds)
        )

    print(f"{'variant':32s} {'monthly-T steps':>15s} {'wall':>8s} {'max dmean':>10s} {'max dstd':>10s}", file=sys.stderr)
    for name, wall, steps, dm, ds in rows:
        print(f"{name:32s} {steps:15d} {wall:7.2f}s {dm:10.4f} {ds:10.4f}", file=sys.stderr)

    scratch = rows[0]
    best = min(rows[1:], key=lambda rr: rr[3])
    print(json.dumps({
        "metric": f"monthly_warm_start_B{b}_T{t}",
        "scratch500": {"wall_s": round(scratch[1], 2), "dmean": scratch[3], "dstd": scratch[4]},
        "best_warm": {"name": best[0], "wall_s": round(best[1], 2), "dmean": best[3], "dstd": best[4]},
    }))


if __name__ == "__main__":
    main()
