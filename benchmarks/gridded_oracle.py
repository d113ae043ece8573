"""CPU float64 oracle for the gridded benchmark's parity gate.

Runs the identical gridded workload (same seed, same pipeline as
``gridded_bench.py``) on a subset of cells in float64 on CPU and writes the
posterior moments to ``gridded_oracle.json``; ``gridded_bench.py`` asserts
pointwise agreement on those cells.  Regenerate with:

    python benchmarks/gridded_oracle.py [n_optim_nits] [n_cells]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import gridded_common as gc

import argparse

ap = argparse.ArgumentParser()
ap.add_argument("n_iters", nargs="?", type=int, default=500)
ap.add_argument("n_cells", nargs="?", type=int, default=64)
ap.add_argument("--warm-stride", type=int, default=0)
ap.add_argument("--fine-nits", type=int, default=0)
ap.add_argument("--lat", type=int, default=180)
ap.add_argument("--lon", type=int, default=360)
from bayesian_ensembling_tpu.utils.cli import add_optimizer_arg  # noqa: E402

add_optimizer_arg(ap)
args = ap.parse_args()
N_ITERS, N_CELLS = args.n_iters, args.n_cells
WARM = args.warm_stride
FINE = args.fine_nits or max(N_ITERS // 5, 50)
OPT = args.optimizer

block, obs = gc.make_workload(N_CELLS, dtype=np.float64)
import jax.numpy as jnp

if WARM:
    # Identical coarse-to-fine algorithm as the bench: fit only the coarse
    # cells serving this subset (per-cell fits are independent, so the
    # subset's params are bit-identical to a full-grid coarse pass).
    gp_init = gc.coarse_params_for(
        np.arange(N_CELLS), args.lat, args.lon, WARM, N_ITERS, np.float64,
        optimizer=OPT,
    )
    mean, std, w = jax.jit(
        lambda b, o, gi: gc.gridded_experiment(
            b, o, FINE, gp_init=gi, optimizer=OPT
        )
    )(jnp.asarray(block), jnp.asarray(obs), gp_init)
    fname = "gridded_oracle_warm.json"
else:
    mean, std, w = jax.jit(
        lambda b, o: gc.gridded_experiment(b, o, N_ITERS, optimizer=OPT)
    )(jnp.asarray(block), jnp.asarray(obs))
    fname = "gridded_oracle.json"
out = {
    "n_optim_nits": N_ITERS,
    "n_cells": N_CELLS,
    "warm_stride": WARM,
    "fine_nits": FINE if WARM else None,
    "lat": args.lat if WARM else None,
    "lon": args.lon if WARM else None,
    "optimizer": OPT,
    "bary_mean": np.round(np.asarray(mean), 8).tolist(),
    "bary_std": np.round(np.asarray(std), 8).tolist(),
}
path = os.path.join(os.path.dirname(__file__), fname)
# Both oracle files keep one entry per configuration so parity gates for
# several settings can coexist (the bench picks the match; a legacy bare
# non-warm file is absorbed as the first entry).
entries = []
if os.path.exists(path):
    with open(path) as f:
        prev = json.load(f)
    entries = prev["entries"] if "entries" in prev else [prev]
entries = gc.replace_oracle_entry(entries, out)
out = {"entries": entries}
with open(path, "w") as f:
    json.dump(out, f)
print(json.dumps({"n_cells": N_CELLS, "warm_stride": WARM, "written": True}))
