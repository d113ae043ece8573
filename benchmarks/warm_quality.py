"""Warm-start fine-pass quality sweep (how few fine steps are enough?).

BASELINE.md's coarse-to-fine result runs the fine pass at n/5 = 100 steps
and shows warm(100) lands CLOSER to the converged optimum than
scratch(500).  This probe measures where the quality actually sits as the
fine step count shrinks: it runs the gridded pipeline on a cell subset at

  * truth:      scratch, 2000 steps (converged reference)
  * baseline:   scratch, 500 steps (the un-warmed production setting)
  * candidates: warm(stride 5) at several fine step counts

and reports each variant's pointwise |d bary_mean| / |d bary_std| against
the truth run, plus wall-clock.  A fine count is acceptable when its error
is no worse than the scratch-500 baseline's (the quality the un-warmed
bench ships).

Usage: python benchmarks/warm_quality.py [lat] [lon] [--fine 30,50,100]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import gridded_common as gc


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("lat", nargs="?", type=int, default=12)
    ap.add_argument("lon", nargs="?", type=int, default=36)
    ap.add_argument("--stride", type=int, default=5)
    ap.add_argument("--fine", default="30,50,100,150")
    ap.add_argument("--truth-nits", type=int, default=2000)
    ap.add_argument("--base-nits", type=int, default=500)
    ap.add_argument("--bfgs", default="30,60",
                    help="scratch step counts for the per-model damped "
                    "quasi-Newton candidates ('' = skip)")
    ap.add_argument("--warm-bfgs", default="5,10,15",
                    help="fine step counts for coarse-to-fine bfgs (coarse "
                    "pass = bfgs at --warm-bfgs-coarse steps; '' = skip)")
    ap.add_argument("--warm-bfgs-coarse", type=int, default=30,
                    help="coarse-pass bfgs step count for --warm-bfgs")
    args = ap.parse_args()
    la, lo = args.lat, args.lon
    c = la * lo
    fine_counts = [int(s) for s in args.fine.split(",")]

    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(
        f"workload: {gc.M} models x {c} cells ({la}x{lo}), stride {args.stride}",
        file=sys.stderr,
    )
    block, obs = gc.make_workload(c, dtype=np.float32)
    block_dev = jax.device_put(block)
    obs_dev = jax.device_put(obs)

    def run(n_iters, gp_init=None, optimizer="adam"):
        step = jax.jit(
            lambda b, o, gi: gc.gridded_experiment(
                b, o, n_iters, gp_init=gi, optimizer=optimizer
            )
        )
        sync(step(block_dev, obs_dev, gp_init))  # compile
        t0 = time.perf_counter()
        out = step(block_dev, obs_dev, gp_init)
        sync(out)
        dt = time.perf_counter() - t0
        return np.asarray(out[0], np.float64), np.asarray(out[1], np.float64), dt

    truth_m, truth_s, _ = run(args.truth_nits)

    rows = []

    def record(tag, m_, s_, dt, coarse_s=0.0):
        dm = float(np.abs(m_ - truth_m).max())
        ds = float(np.abs(s_ - truth_s).max())
        rows.append(
            {
                "variant": tag,
                "max_dmean": dm,
                "max_dstd": ds,
                "fine_seconds": round(dt, 3),
                "coarse_seconds": round(coarse_s, 3),
            }
        )
        print(
            f"{tag:>14}: max|dmean| {dm:.2e}  max|dstd| {ds:.2e}  "
            f"fine {dt:.2f}s + coarse {coarse_s:.2f}s",
            file=sys.stderr,
        )

    bm, bs_, dt = run(args.base_nits)
    record(f"scratch{args.base_nits}", bm, bs_, dt)

    t0 = time.perf_counter()
    gp_init = gc.coarse_params_for(
        np.arange(c), la, lo, args.stride, args.base_nits, np.float32
    )
    coarse_s = time.perf_counter() - t0
    for f in fine_counts:
        m_, s_, dt = run(f, gp_init=gp_init)
        record(f"warm{args.stride}x{f}", m_, s_, dt, coarse_s)

    # Per-model damped quasi-Newton, scratch (no coarse pass at all): the
    # fewest-FLOPs route if its quality clears the scratch baseline.
    for n in (int(s) for s in args.bfgs.split(",") if s):
        m_, s_, dt = run(n, optimizer="bfgs")
        record(f"bfgs{n}", m_, s_, dt)

    # Coarse-to-fine bfgs: neighbouring cells share near-identical optima,
    # so a bfgs fine pass warm-started from a stride-S bfgs coarse fit
    # should need only a handful of damped quasi-Newton steps per cell.
    warm_bfgs = [int(s) for s in args.warm_bfgs.split(",") if s]
    if warm_bfgs:
        t0 = time.perf_counter()
        gp_init_b = gc.coarse_params_for(
            np.arange(c), la, lo, args.stride, args.warm_bfgs_coarse,
            np.float32, optimizer="bfgs",
        )
        coarse_b = time.perf_counter() - t0
        for f in warm_bfgs:
            m_, s_, dt = run(f, gp_init=gp_init_b, optimizer="bfgs")
            record(f"warmbfgs{args.stride}x{f}", m_, s_, dt, coarse_b)

    base = rows[0]
    ok = [
        r
        for r in rows[1:]
        if r["max_dmean"] <= base["max_dmean"] and r["max_dstd"] <= base["max_dstd"]
    ]
    print(json.dumps({"rows": rows, "acceptable": [r["variant"] for r in ok]}))


if __name__ == "__main__":
    main()
