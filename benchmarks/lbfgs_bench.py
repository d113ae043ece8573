"""L-BFGS fast path for the full 7-SSP experiment, measured end to end.

The headline bench (bench.py) runs the reference's own workload definition —
2000 Adam steps per fit (full_experiment_script.py:87) — for apples-to-apples
speedup and parity numbers.  BASELINE.md's per-stage analysis shows that scan
is 90% of the 1.2 s steady state and already within ~30% of the VPU roofline,
so "further gains must come from fewer optimisation steps".  This bench
measures exactly that claim: the SAME merged 7-scenario program with
``optimizer="lbfgs"`` (optax L-BFGS + zoom linesearch, ops/gp.fit_gp_batch)
at a far smaller step count, gated POINTWISE against the same float64 CPU
anchors as bench.py — the fast path only counts if it reproduces the
converged answers.

Usage: python benchmarks/lbfgs_bench.py [n_steps] [reps]
Prints one JSON line with wall-clock + parity vs benchmarks/cpu_baseline.json
(the Adam-2000 f64 anchor).
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


def main():
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.parallel.step import (
        ensemble_multi_scenario_step,
        pad_models,
    )
    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    obs_pm = pipeline.load_observations()
    obs = jnp.asarray(obs_pm.data.values, dtype=jnp.float32)
    scenarios = []
    for ssp in pipeline.ALL_SSPS:
        hist, ssp_mc = pipeline.load_scenario(ssp)
        scenarios.append((ssp, hist, ssp_mc))
    m_max = max(len(h) for _, h, _ in scenarios)
    r_max = max(max(h.max_realisations, s.max_realisations) for _, h, s in scenarios)
    packed = []
    for ssp, hist, ssp_mc in scenarios:
        hb, hm = hist.padded_stack(r_target=r_max)
        sb, sm = ssp_mc.padded_stack(r_target=r_max)
        hb, hm, mmask = pad_models(hb, hm, m_max)
        sb, sm, _ = pad_models(sb, sm, m_max)
        packed.append((hb, hm, sb, sm, mmask))
    hb, hm, sb, sm, mmask = (
        jnp.asarray(np.stack([p[i] for p in packed])) for i in range(5)
    )

    step = jax.jit(
        functools.partial(
            ensemble_multi_scenario_step,
            n_optim_nits=n_steps,
            optimizer="lbfgs",
        )
    )
    args = (hb, hm, sb, sm, obs, mmask)
    t0 = time.perf_counter()
    out = step(*args)  # warmup output doubles as the parity sample if reps=0
    sync(out)
    warmup = time.perf_counter() - t0
    print(f"warmup: {warmup:.1f}s", file=sys.stderr)
    elapsed = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        out = step(*args)
        sync(out)
        rep_s = time.perf_counter() - t0
        print(f"rep {rep}: {rep_s:.3f}s", file=sys.stderr)
        elapsed = min(elapsed, rep_s)

    bmean, bstd, _ = (np.asarray(a) for a in out)
    assert np.isfinite(bmean).all() and np.isfinite(bstd).all()

    # Pointwise parity vs the Adam-2000 float64 CPU anchor — same gates as
    # bench.py.  L-BFGS and Adam are different trajectories to the SAME
    # separable optimum; agreement here is the claim that the fast path
    # changes nothing but the wall-clock.
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpu_baseline.json")
    parity_mean = parity_std = None
    with open(base) as f:
        cpu = json.load(f)
    mdiffs, sdiffs = [], []
    for i, (ssp, _, _) in enumerate(scenarios):
        rec = cpu["scenarios"].get(ssp)
        if not rec or "bary_mean" not in rec:
            continue
        mdiffs.append(np.abs(bmean[i] - np.asarray(rec["bary_mean"])).max())
        sdiffs.append(np.abs(bstd[i] - np.asarray(rec["bary_std"])).max())
        print(
            f"{ssp}: 2100 warming {bmean[i, -1]:.3f}+-{2 * bstd[i, -1]:.3f} "
            f"(anchor {rec['bary_mean'][-1]:.3f})",
            file=sys.stderr,
        )
    if mdiffs:
        parity_mean = float(max(mdiffs))
        parity_std = float(max(sdiffs))
        print(
            f"parity vs Adam-2000 f64 anchor: max |dmean| {parity_mean:.5f} "
            f"degC, max |dstd| {parity_std:.5f} degC",
            file=sys.stderr,
        )

    print(json.dumps({
        "metric": f"gmst_7ssp_lbfgs{n_steps}_weight_barycentre",
        "value": round(elapsed, 3),
        "unit": "s",
        "warmup_s": round(warmup, 1),
        "parity_pointwise_mean_degC": round(parity_mean, 6) if parity_mean is not None else None,
        "parity_pointwise_std_degC": round(parity_std, 6) if parity_std is not None else None,
    }))


if __name__ == "__main__":
    main()
