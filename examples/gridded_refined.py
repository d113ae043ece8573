"""Gridded f64 refinement: f32 speed, f64-exact published artifacts.

Round-5 capability walk-through on a small synthetic grid:

1. fit the gridded pipeline in float32 (where the TPU speed is),
   returning the converged hyperparameters + DBA targets;
2. refine: re-run ONLY the per-cell posterior solves and the
   weighting/barycentre tail in float64 at those hyperparameters
   (``parallel.gridded.refined_gridded_f64``) — removes the f32 solve
   scatter from the published moments without refitting anything;
3. show the two agree to the f32 scatter scale, and that the refined
   moments are what ``run_gridded_scenario(refine_f64=True)`` (and serve
   ``build-gridded --refine-f64``) publish.

The same pass is chunked for big grids (``cell_chunk``) and runs on the
host CPU by default in the bench (native f64); at 0.25° the fit streams
21 GB of inputs through HBM-sized slabs first (BASELINE.md "0.25°
global grid") and the refinement consumes the collected fit products.

    python examples/gridded_refined.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_ensembling_tpu.parallel.gridded import (
    gridded_ensemble_step,
    refined_gridded_f64,
)


def main():
    rng = np.random.default_rng(0)
    m, c, r, t = 3, 8, 4, 24
    signal = np.sin(np.linspace(0, 3, t)).astype(np.float32)
    block = (signal + 0.3 * rng.normal(size=(m, c, r, t))).astype(np.float32)
    obs = (signal + 0.3 * rng.normal(size=(c, r, t))).astype(np.float32)
    mask = np.ones((m, c, r), bool)

    # 1) f32 fit + ensemble, returning the refinement's inputs.
    step = jax.jit(
        functools.partial(
            gridded_ensemble_step, n_optim_nits=60, return_fit=True
        )
    )
    bm32, bs32, w, params, y_mean, y_var = step(
        jnp.asarray(block), jnp.asarray(obs), jnp.asarray(mask)
    )

    # 2) f64 refinement at the converged hyperparameters (chunked).
    bm64, bs64, w64 = refined_gridded_f64(
        block, obs, mask, params, (y_mean, y_var), cell_chunk=3
    )

    drift = np.abs(np.asarray(bm32, np.float64) - bm64).max()
    print(f"refined moments dtype: {bm64.dtype}")
    print(f"f32->f64 moment drift removed: {drift:.2e}")
    assert bm64.dtype == np.float64 and np.isfinite(bm64).all()
    assert drift < 1e-3  # the f32 solve scatter, nothing structural

    # 3) the library surface publishes exactly this via refine_f64=True
    #    (see pipeline.run_gridded_scenario / GPDTW3D.fit_collection).
    print("refined barycentre mean, first cell:",
          np.array2string(bm64[0, :5], precision=4))


if __name__ == "__main__":
    main()
