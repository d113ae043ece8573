"""Warm-in-time on the ANNUAL headline workload: equal-quality in ~0.3 s.

The headline bench (bench.py) is workload-faithful: 2000 scratch Adam
iterations per emulator, the reference's own configuration
(/root/reference/experiments/full_experiment_script.py:87), with pointwise
parity gated against a float64 CPU oracle running the identical algorithm.
This bench asks the *other* question: how fast can the SAME experiment
reach the SAME (or better) closeness to the converged hyperparameter
optimum, using the coarse-to-fine-in-time fit (ops/gp.fit_gp_batch_warm_time)?

At annual resolution the stride-12 coarse series has T = 14, where the
batch-in-lanes kernels price a step at a small fraction of the T = 165
cost — so a long coarse pass is nearly free and the full-T fine pass can
be short.  Measured (v5e single chip, min over fresh-buffer reps; closeness
= max |Δ| of the final barycentre moments vs a 10,000-step converged truth):

    scratch-2000 (headline)    1.207 s   dmean 0.0191  dstd 0.0091
    warm s12 c1000 f250        0.304 s   dmean 0.0183  dstd 0.0097
    warm s12 c2000 f500        0.442 s   dmean 0.0148  dstd 0.0054
    bfgs-30                    0.201 s   dmean 0.0162  dstd 0.0053
    bfgs-60                    0.225 s   dmean 0.0163  dstd 0.0053
    warm s12 bfgs c30 f20      0.192 s   dmean 0.0138  dstd 0.0024

(one 2026-08-19 run; the tunnelled link adds ~±10% run-to-run on the
sub-second rows — BASELINE.md carries the SAME run so the two documents
agree.)  i.e. the warm fit matches the reference-workload convergence at
4.0x less wall, and strictly beats it on both moments at 2.7x less; the
per-model damped quasi-Newton (optimizer="bfgs", ops/gp._build_batch_step)
strictly beats the headline on both moments at 6.0x less wall, with its own
algorithm-identity parity gate against a float64 CPU anchor running the
IDENTICAL bfgs-30 fit (cpu_baseline.py 30 1 none bfgs ->
cpu_baseline_bfgs.json, 54.5 s CPU).  (Side measurement: the reference's
own 2000-iteration convention sits ~0.02 degC from its converged optimum —
the same order as its warming-trend signal's last-digit precision.)

The headline bench keeps the faithful scratch configuration because its
parity gate is an algorithm-identity check against the CPU oracle; this
bench's gate is closeness-to-convergence, the right gate for a schedule
that deliberately differs.

Usage: python benchmarks/annual_warm_bench.py [truth_steps]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def _warm_parity(out, names, kw, anchor="cpu_baseline_warm.json"):
    """Pointwise algorithm-identity parity of a TPU-f32 run against the
    f64 CPU anchor running the IDENTICAL schedule
    (benchmarks/cpu_baseline.py [nits] [stride] [fine] [optimizer] →
    cpu_baseline_warm.json / cpu_baseline_bfgs.json) — the same gate
    bench.py applies to the scratch headline.  Returns (max dmean,
    max dstd) or None when no matching anchor is committed."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), anchor)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        cpu = json.load(f)
    if (cpu.get("n_optim_nits") != kw.get("n_optim_nits")
            or cpu.get("time_stride") != kw.get("time_stride", None)
            or cpu.get("fine_steps") != kw.get("fine_steps", None)
            or cpu.get("optimizer", "adam") != kw.get("optimizer", "adam")):
        print(f"parity anchor {anchor} config mismatch — skipping gate",
              file=sys.stderr)
        return None
    mdiffs, sdiffs = [], []
    for i, ssp in enumerate(names):
        rec = cpu["scenarios"].get(ssp)
        if not rec or "bary_mean" not in rec:
            continue
        mdiffs.append(np.abs(np.asarray(out[0][i], np.float64)
                             - np.asarray(rec["bary_mean"])).max())
        sdiffs.append(np.abs(np.asarray(out[1][i], np.float64)
                             - np.asarray(rec["bary_std"])).max())
    if not mdiffs:
        print("warm parity anchor has no overlapping scenarios — "
              "skipping gate", file=sys.stderr)
        return None
    pm, ps = float(max(mdiffs)), float(max(sdiffs))
    print(f"parity vs f64 CPU anchor {anchor}: max |dmean| {pm:.5f} degC, "
          f"max |dstd| {ps:.5f} degC", file=sys.stderr)
    assert pm < 0.01 and ps < 0.01, (pm, ps)
    return pm, ps


def main():
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.parallel.step import (
        ensemble_multi_scenario_step,
    )
    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    truth_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10000

    obs = jnp.asarray(
        pipeline.load_observations().data.values, dtype=jnp.float32
    )
    *stacked, _names = pipeline.load_packed_scenarios()
    hb, hm, sb, sm, mmask = (jnp.asarray(a) for a in stacked)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    def make_step(**kw):
        return jax.jit(
            functools.partial(
                ensemble_multi_scenario_step, dba_iterations=10, **kw
            )
        )

    def run(**kw):
        step = make_step(**kw)
        sync(step(hb, hm, sb, sm, obs, mmask))  # compile + warm
        best, out = float("inf"), None
        for _ in range(3):
            hbc = hb + 0.0  # fresh buffers: the tunnel dedups identical inputs
            sync(hbc)
            t0 = time.perf_counter()
            out = step(hbc, hm, sb, sm, obs, mmask)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return out, best

    # The truth's wall time is discarded — run the expensive converged
    # program exactly once, not through run()'s timed-rep loop.
    truth = make_step(n_optim_nits=truth_steps)(hb, hm, sb, sm, obs, mmask)
    sync(truth)
    tm, ts = np.asarray(truth[0]), np.asarray(truth[1])

    rows = []
    parity = None
    bfgs_parity = None
    for name, kw in [
        ("scratch2000", dict(n_optim_nits=2000)),
        ("warm_s12_c1000_f250",
         dict(n_optim_nits=1000, time_stride=12, fine_steps=250)),
        ("warm_s12_c2000_f500",
         dict(n_optim_nits=2000, time_stride=12, fine_steps=500)),
        # Per-model damped quasi-Newton (ops/gp._build_batch_step
        # optimizer="bfgs"): ~1.5x an Adam step but converges in tens of
        # steps instead of thousands — the fewest-FLOPs route to the
        # converged optimum on this workload.
        ("bfgs30", dict(n_optim_nits=30, optimizer="bfgs")),
        ("bfgs60", dict(n_optim_nits=60, optimizer="bfgs")),
        ("warm_s12_bfgs_c30_f20",
         dict(n_optim_nits=30, time_stride=12, fine_steps=20,
              optimizer="bfgs")),
    ]:
        out, wall = run(**kw)
        dm = float(np.abs(np.asarray(out[0]) - tm).max())
        ds = float(np.abs(np.asarray(out[1]) - ts).max())
        rows.append((name, wall, dm, ds))
        print(f"{name:22s} wall {wall:6.3f}s  dmean {dm:.4f}  dstd {ds:.4f}",
              file=sys.stderr)
        if name == "warm_s12_c1000_f250":
            parity = _warm_parity(out, _names, kw)
        elif name == "bfgs30":
            bfgs_parity = _warm_parity(
                out, _names, kw, anchor="cpu_baseline_bfgs.json"
            )

    scratch = rows[0]
    best = min(rows[1:], key=lambda r: r[2])
    print(json.dumps({
        "metric": "annual_warm_vs_scratch2000",
        "scratch": {"wall_s": round(scratch[1], 3),
                    "dmean": scratch[2], "dstd": scratch[3]},
        "best_warm": {"name": best[0], "wall_s": round(best[1], 3),
                      "dmean": best[2], "dstd": best[3]},
        "warm_parity_vs_f64_anchor": (
            [round(p, 6) for p in parity] if parity else None
        ),
        "bfgs_parity_vs_f64_anchor": (
            [round(p, 6) for p in bfgs_parity] if bfgs_parity else None
        ),
    }))


if __name__ == "__main__":
    main()
