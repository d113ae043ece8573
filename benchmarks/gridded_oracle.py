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

N_ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 500
N_CELLS = int(sys.argv[2]) if len(sys.argv) > 2 else 64

block, obs = gc.make_workload(N_CELLS, dtype=np.float64)
import jax.numpy as jnp

mean, std, w = jax.jit(lambda b, o: gc.gridded_experiment(b, o, N_ITERS))(
    jnp.asarray(block), jnp.asarray(obs)
)
out = {
    "n_optim_nits": N_ITERS,
    "n_cells": N_CELLS,
    "bary_mean": np.round(np.asarray(mean), 8).tolist(),
    "bary_std": np.round(np.asarray(std), 8).tolist(),
}
with open(os.path.join(os.path.dirname(__file__), "gridded_oracle.json"), "w") as f:
    json.dump(out, f)
print(json.dumps({"n_cells": N_CELLS, "written": True}))
