"""f64 CPU oracle for the GRIDDED surface at MATCHED hyperparameters.

The gridded twin of ``matched_hparams_oracle.py`` (VERDICT r4: the gridded
artifacts were the last surface still carrying f32 solve scatter): takes the
TPU run's f32-converged per-(model, cell) hyperparameters AND its f32 DBA
targets, recomputes posterior marginals -> per-cell weights -> W2 barycentre
in float64 on CPU, and writes the f64 moments.  Agreement of the bench's
``--refine-f64`` output with this oracle is then a pure computation-parity
statement (the trajectory term is removed by construction) — the form
BASELINE.json's "within 1e-5" target was written for.

Run as a subprocess (gridded_bench.py drives it on the oracle's first-N
cell subset): reads an .npz of inputs + params, writes an .npz of f64
barycentre moments.

Usage: python benchmarks/gridded_matched_oracle.py IN.npz OUT.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from bayesian_ensembling_tpu.ops import gp as gp_ops
from bayesian_ensembling_tpu.parallel.gridded import gridded_tail


def run(in_path: str, out_path: str) -> None:
    z = np.load(in_path)
    m, c, r, t = z["block"].shape
    params = gp_ops.GPParams(
        raw_lengthscale=jnp.asarray(
            z["raw_lengthscale"].reshape(m * c), jnp.float64
        ),
        raw_variance=jnp.asarray(z["raw_variance"].reshape(m * c), jnp.float64),
    )
    x = jnp.swapaxes(
        jnp.asarray(z["block"].reshape(m * c, r, t), jnp.float64), 1, 2
    )
    ym = jnp.asarray(z["y_mean"].reshape(m * c, t), jnp.float64)
    yv = jnp.asarray(z["y_var"].reshape(m * c, t), jnp.float64)
    mu, var = gp_ops.posterior_marginals_batch(
        params, x, ym, yv,
        kernel_name=str(z["kernel_name"]), jitter=float(z["jitter"]),
    )
    var = var + yv
    bm, bs, w = gridded_tail(
        mu.reshape(m, c, t),
        var.reshape(m, c, t),
        jnp.asarray(z["obs"], jnp.float64),
        jnp.asarray(z["block"], jnp.float64),
        jnp.asarray(z["mask"]),
        weight_kind=str(z["weight_kind"]),
        sigma_mode=str(z["sigma_mode"]),
    )
    np.savez(
        out_path,
        bary_mean=np.asarray(bm, np.float64),
        bary_std=np.asarray(bs, np.float64),
        weights=np.asarray(w, np.float64),
    )


if __name__ == "__main__":
    run(sys.argv[1], sys.argv[2])
