"""f64 CPU oracle at MATCHED hyperparameters — closes BASELINE.json's 1e-5 line.

The headline parity figure (2.3e-4 °C) compares two INDEPENDENT 2000-step
optimiser trajectories (f32 TPU vs f64 CPU), so it measures trajectory
divergence, not computation error.  This oracle removes the trajectory term:
it takes the TPU run's CONVERGED hyperparameters (and optionally its DBA
mean targets) and recomputes the full posterior → weights → barycentre
pipeline in float64 on CPU.  Pointwise agreement of the result with the TPU
run's own barycentre moments is then a pure computation-parity statement on
the real 7-SSP workload — the form BASELINE.json's "posterior mean/variance
within 1e-5" target was written for (VERDICT r3 item 4).

Two oracle modes, both reported by bench.py:

* ``matched_hparams`` — hyperparameters transferred, DBA targets recomputed
  in f64.  Includes any f32-vs-f64 DTW path flips (branchy DP near-ties).
* ``matched_targets`` — hyperparameters AND the TPU's f32 DBA targets
  transferred: the pure linear-algebra + weighting + combination parity.

Run as a subprocess (bench.py drives it): reads an .npz of inputs + params,
writes an .npz of f64 barycentre moments.

Usage: python benchmarks/matched_hparams_oracle.py IN.npz OUT.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import functools

import jax.numpy as jnp
import numpy as np

from bayesian_ensembling_tpu.ops import gp as gp_ops
from bayesian_ensembling_tpu.parallel.step import (
    emulate_marginals,
    multi_scenario_tail,
)


def run(in_path: str, out_path: str) -> None:
    z = np.load(in_path)
    s, m, r, t_hist = z["hb"].shape
    t_ssp = z["sb"].shape[-1]
    hb = jnp.asarray(z["hb"], jnp.float64).reshape(s * m, r, t_hist)
    hm = jnp.asarray(z["hm"]).reshape(s * m, r)
    sb = jnp.asarray(z["sb"], jnp.float64).reshape(s * m, r, t_ssp)
    sm = jnp.asarray(z["sm"]).reshape(s * m, r)
    obs = jnp.asarray(z["obs"], jnp.float64)
    dba_iterations = int(z["dba_iterations"])

    def params(prefix):
        return gp_ops.GPParams(
            raw_lengthscale=jnp.asarray(z[f"{prefix}_raw_lengthscale"], jnp.float64),
            raw_variance=jnp.asarray(z[f"{prefix}_raw_variance"], jnp.float64),
        )

    out = {}
    tail = jax.jit(multi_scenario_tail)

    # Mode 1: matched hyperparameters, DBA targets recomputed in f64.
    em = jax.jit(
        functools.partial(
            emulate_marginals, n_optim_nits=0, dba_iterations=dba_iterations
        )
    )
    h_mu, h_var = em(hb, hm, gp_init=params("hist"))
    s_mu, s_var = em(sb, sm, gp_init=params("ssp"))
    bm, bs, _ = tail(
        h_mu.reshape(s, m, t_hist), h_var.reshape(s, m, t_hist),
        s_mu.reshape(s, m, t_ssp), s_var.reshape(s, m, t_ssp),
        obs, jnp.asarray(z["hb"], jnp.float64), jnp.asarray(z["hm"]),
        jnp.asarray(z["mmask"], jnp.float64),
    )
    out["hparams_bary_mean"] = np.asarray(bm, np.float64)
    out["hparams_bary_std"] = np.asarray(bs, np.float64)

    # Mode 2: matched hyperparameters AND the TPU's f32 DBA targets/noise —
    # pure posterior-computation + tail parity.
    def marginals(pfx, x_block, y_mean, y_var):
        p = params(pfx)
        mu, var = gp_ops.posterior_marginals_batch(
            p,
            jnp.swapaxes(x_block, 1, 2),
            jnp.asarray(y_mean, jnp.float64),
            jnp.asarray(y_var, jnp.float64),
        )
        return mu, var + jnp.asarray(y_var, jnp.float64)

    h_mu2, h_var2 = marginals("hist", hb, z["hist_y_mean"], z["hist_y_var"])
    s_mu2, s_var2 = marginals("ssp", sb, z["ssp_y_mean"], z["ssp_y_var"])
    bm2, bs2, _ = tail(
        h_mu2.reshape(s, m, t_hist), h_var2.reshape(s, m, t_hist),
        s_mu2.reshape(s, m, t_ssp), s_var2.reshape(s, m, t_ssp),
        obs, jnp.asarray(z["hb"], jnp.float64), jnp.asarray(z["hm"]),
        jnp.asarray(z["mmask"], jnp.float64),
    )
    out["targets_bary_mean"] = np.asarray(bm2, np.float64)
    out["targets_bary_std"] = np.asarray(bs2, np.float64)

    np.savez(out_path, **out)


if __name__ == "__main__":
    run(sys.argv[1], sys.argv[2])
