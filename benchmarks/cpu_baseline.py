"""Measure the CPU reference path for the full 7-SSP GMST experiment.

This records the self-measured baseline demanded by BASELINE.md (the
reference publishes no numbers): the float64 CPU path of this framework,
run with the reference experiment's settings (GPDTW1D, 2000 optimisation
iterations, CRPS weights, barycentre; full_experiment_script.py:87-143).

Usage: python benchmarks/cpu_baseline.py [n_optim_nits] [time_stride] [fine_steps] [optimizer]

With a time_stride > 1 the anchor runs the coarse-to-fine-in-time schedule
instead (ops/gp.fit_gp_batch_warm_time) and writes cpu_baseline_warm.json —
the algorithm-identity parity anchor for benchmarks/annual_warm_bench.py.
With optimizer="bfgs" (pass fine_steps as 0/none when unused) it runs the
per-model damped quasi-Newton fit and writes cpu_baseline_bfgs.json — the
parity anchor for that bench's bfgs rows.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from bayesian_ensembling_tpu import pipeline
from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D

N_ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
TIME_STRIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 1
FINE_STEPS = (
    int(sys.argv[3])
    if len(sys.argv) > 3 and sys.argv[3] not in ("0", "none")
    else None
)
OPTIMIZER = sys.argv[4] if len(sys.argv) > 4 else "adam"

obs = pipeline.load_observations()
results = {}
t_all = time.time()
for ssp in pipeline.ALL_SSPS:
    hist, ssp_mc = pipeline.load_scenario(ssp)
    t0 = time.time()
    res = pipeline.run_scenario(
        hist, ssp_mc, obs, ssp,
        emulator=GPDTW1D(dtype=np.float64),
        n_optim_nits=N_ITERS,
        time_stride=TIME_STRIDE,
        fine_steps=FINE_STEPS,
        optimizer=OPTIMIZER,
    )
    dt = time.time() - t0
    summ = pipeline.warming_summary(res)
    bary_mean = np.asarray(res.barycentre.gaussian.mean)
    bary_std = np.sqrt(np.asarray(res.barycentre.gaussian.variance))
    results[ssp] = {
        "seconds": dt,
        "n_models": len(hist),
        "warming_2050": summ[2050],
        "warming_2100": summ[2100],
        # FULL posterior moment vectors: bench.py gates pointwise TPU-f32
        # parity against these (BASELINE.json / VERDICT r1 item 1).
        "bary_mean": np.round(bary_mean, 8).tolist(),
        "bary_std": np.round(bary_std, 8).tolist(),
    }
    print(ssp, f"{dt:.1f}s", summ[2100], flush=True)

total = time.time() - t_all
out = {"n_optim_nits": N_ITERS, "dba_iterations": 10, "total_seconds": total, "scenarios": results}
name = "cpu_baseline.json"
if TIME_STRIDE > 1:
    out["time_stride"] = TIME_STRIDE
    out["fine_steps"] = FINE_STEPS
    name = "cpu_baseline_warm.json"
if OPTIMIZER != "adam":
    out["optimizer"] = OPTIMIZER
    name = "cpu_baseline_bfgs.json"
with open(os.path.join(os.path.dirname(__file__), name), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({"total_seconds": total}))
