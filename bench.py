"""Headline benchmark: full 7-SSP GMST experiment on the accelerator.

Workload = the reference's flagship experiment
(``/root/reference/experiments/full_experiment_script.py``): for each of the
7 SSP scenarios, emulate every CMIP6 member (DBA barycentre + heteroskedastic
GP, 2000 optimisation iterations), weight against HadCRUT5 (CRPS), and
combine with the W2 barycentre.  Here each scenario runs as ONE fused XLA
program (bayesian_ensembling_tpu/parallel/step.py); all scenarios share one
compiled executable via global (model, realisation) padding.

Prints exactly one JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
where vs_baseline = CPU-float64 reference-path seconds / this run's seconds
(the reference publishes no numbers — BASELINE.md records the self-measured
CPU anchor, benchmarks/cpu_baseline.json).
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

_CACHE_DIR = enable_persistent_cache()


def _probe_backend(timeout_s: int = 180) -> None:
    """Fail fast when the accelerator is unreachable.

    The tunnelled TPU plugin can block ~30 minutes inside backend init when
    the chip/tunnel is down; a subprocess probe with a hard timeout turns
    that into a loud, quick failure instead of silently eating the whole
    measurement window.  Skippable via BENCH_SKIP_PROBE=1."""
    if os.environ.get("BENCH_SKIP_PROBE"):
        return
    import subprocess

    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "np.asarray(jax.jit(lambda a: a + 1)(jnp.ones(8)));"
        "print(jax.devices())"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"bench: accelerator backend unreachable (probe exceeded "
            f"{timeout_s}s — tunnel/chip down?). Set BENCH_SKIP_PROBE=1 to "
            "bypass."
        )
    if proc.returncode != 0:
        raise SystemExit(
            "bench: accelerator backend probe failed:\n" + proc.stderr[-2000:]
        )


_probe_backend()

import jax
import jax.numpy as jnp

from bayesian_ensembling_tpu import pipeline
from bayesian_ensembling_tpu.parallel.step import ensemble_multi_scenario_step

N_ITERS = int(os.environ.get("BENCH_N_ITERS", "2000"))
DBA_ITERS = int(os.environ.get("BENCH_DBA_ITERS", "10"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("devices:", jax.devices())
    obs_pm = pipeline.load_observations()
    obs = jnp.asarray(obs_pm.data.values, dtype=jnp.float32)

    # Merge the scenario axis into the batch: all 7 scenarios' emulations run
    # in ONE fused program through the Pallas batched-cholesky NLML path.
    *stacked, ssp_names = pipeline.load_packed_scenarios()
    hb, hm, sb, sm, mmask = (jnp.asarray(a) for a in stacked)
    log(f"padding all scenarios to M={hb.shape[1]}, R={hb.shape[2]}")

    step = jax.jit(
        functools.partial(
            ensemble_multi_scenario_step,
            n_optim_nits=N_ITERS,
            dba_iterations=DBA_ITERS,
        )
    )

    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    log(f"persistent compile cache: {_CACHE_DIR or 'disabled'}")
    t0 = time.perf_counter()
    sync(step(hb, hm, sb, sm, obs, mmask))
    warmup_s = time.perf_counter() - t0
    log(f"warmup (session init + compile + first run): {warmup_s:.1f}s")

    if os.environ.get("BENCH_TRACE"):
        # Device trace for TensorBoard (SURVEY SS5.1 tracing subsystem).
        from bayesian_ensembling_tpu.utils.profiling import trace

        with trace(os.environ.get("BENCH_TRACE_DIR", "/tmp/bet_trace")) as d:
            sync(step(hb, hm, sb, sm, obs, mmask))
        log(f"profiler trace written to {d}")

    # Min over a few steady-state reps: the tunnelled link's throughput
    # fluctuates >2x between measurement windows (BASELINE.md), and the
    # minimum is the honest steady-state figure for a deterministic program.
    reps = max(int(os.environ.get("BENCH_REPS", "3")), 1)
    elapsed = float("inf")
    for rep in range(reps):
        # Fresh input buffers each rep: the tunnelled chip can dedup an
        # execution on byte-identical buffers to ~0.1 ms (BASELINE.md
        # quirks), which min-over-reps would then publish as the headline.
        hb_rep = hb + 0.0
        sync(hb_rep)
        t0 = time.perf_counter()
        out = step(hb_rep, hm, sb, sm, obs, mmask)
        sync(out)
        rep_s = time.perf_counter() - t0
        log(f"rep {rep}: {rep_s:.3f}s")
        elapsed = min(elapsed, rep_s)

    bmean, bstd, _ = out
    for i, ssp in enumerate(ssp_names):
        m = np.asarray(bmean[i])
        s = np.asarray(bstd[i])
        log(f"{ssp}: 2100 warming {m[-1]:.3f} (+-2sd {m[-1]-2*s[-1]:.3f}..{m[-1]+2*s[-1]:.3f})")

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "cpu_baseline.json")
    vs = None
    parity_mean = None
    parity_std = None
    # Pointwise posterior-moment parity gate vs the float64 CPU anchor
    # (BASELINE.json: the speedup must not change answers).  f32 tolerance
    # rationale (BASELINE.md): 2000 independent f32-vs-f64 Adam trajectories
    # agree to ~1e-3 degC pointwise on these workloads; 1e-5 would require
    # f64 accumulation on-chip.  Gate set at 3x the observed worst case.
    MEAN_TOL = float(os.environ.get("BENCH_PARITY_MEAN_TOL", "0.01"))
    STD_TOL = float(os.environ.get("BENCH_PARITY_STD_TOL", "0.01"))
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            cpu = json.load(f)
        # Comparable only when BOTH workload knobs match the anchor's
        # (the anchor ran run_scenario's default of 10 DBA iterations).
        if (
            cpu.get("n_optim_nits") == N_ITERS
            and cpu.get("dba_iterations", 10) == DBA_ITERS
        ):
            vs = cpu["total_seconds"] / elapsed
            mdiffs, sdiffs = [], []
            for i, ssp in enumerate(ssp_names):
                rec = cpu["scenarios"].get(ssp)
                if not rec or "bary_mean" not in rec:
                    continue
                got_m = np.asarray(bmean[i], dtype=np.float64)
                got_s = np.asarray(bstd[i], dtype=np.float64)
                want_m = np.asarray(rec["bary_mean"])
                want_s = np.asarray(rec["bary_std"])
                mdiffs.append(np.abs(got_m - want_m).max())
                sdiffs.append(np.abs(got_s - want_s).max())
            if mdiffs:
                parity_mean = float(max(mdiffs))
                parity_std = float(max(sdiffs))
                log(
                    f"parity vs CPU float64 anchor (pointwise, all scenarios): "
                    f"max |dmean| {parity_mean:.5f} degC, max |dstd| {parity_std:.5f} degC"
                )
                assert parity_mean < MEAN_TOL, (
                    f"posterior mean divergence {parity_mean:.5f} degC >= {MEAN_TOL}"
                )
                assert parity_std < STD_TOL, (
                    f"posterior std divergence {parity_std:.5f} degC >= {STD_TOL}"
                )

    print(json.dumps({
        "metric": "gmst_full_experiment_7ssp_fit2000_weight_barycentre",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs else None,
        "warmup_s": round(warmup_s, 1),
        "reps": reps,
        "compile_cache": bool(_CACHE_DIR),
        "parity_pointwise_mean_degC": round(parity_mean, 6) if parity_mean is not None else None,
        "parity_pointwise_std_degC": round(parity_std, 6) if parity_std is not None else None,
    }))


if __name__ == "__main__":
    main()
