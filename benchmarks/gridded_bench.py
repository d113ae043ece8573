"""Gridded experiment benchmark (the BASELINE.md north-star configuration).

Synthetic CMIP6-vs-HadCRUT5-scale gridded workload: M climate models on a
global lat/lon grid, per-cell DBA + heteroskedastic GP emulation (GPDTW3D
batched mode), per-cell CRPS weighting against gridded observations, and the
per-cell W2 barycentre.  The bundled reference data is GMST-only (already
area-averaged), so the workload is synthetic but dimensioned like the real
thing: 5 models x 72x36 grid (5 deg) x 10 realisations x 86 annual steps
= 12,960 independent GP fits.

North star: full gridded fit + ensemble < 60 s on a v5e-8 slice.  This bench
runs single-chip; the pipeline shards over cells with zero collectives
(parallel/gridded.py), so the v5e-8 estimate is ~1/8 of the single-chip time.

Usage: python benchmarks/gridded_bench.py [n_optim_nits] [lat] [lon]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.ops import scoring
    from bayesian_ensembling_tpu.parallel.step import emulate_marginals

    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    la = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 72
    m, r, t, r_obs = 5, 10, 86, 10
    c = la * lo
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(
        f"workload: {m} models x {c} cells x {r} realisations x {t} steps "
        f"= {m * c} GP fits, {n_iters} optimisation iterations",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    signal = np.sin(np.linspace(0, 3, t))[None, None, None, :]
    block = (signal + 0.3 * rng.normal(size=(m, c, r, t))).astype(np.float32)
    obs = (signal[0] + 0.3 * rng.normal(size=(c, r_obs, t))).astype(np.float32)

    def gridded_experiment(blocks, obs):
        # blocks: (M, C, R, T) -> emulate every (model, cell) GP at once.
        mean, var = emulate_marginals(
            blocks.reshape(m * c, r, t),
            jnp.ones((m * c, r), bool),
            n_optim_nits=n_iters,
        )
        mean = mean.reshape(m, c, t)
        var = var.reshape(m, c, t)
        # Per-cell CRPS weights vs the gridded obs, normalised over models.
        score = jax.vmap(  # over models
            jax.vmap(scoring.mean_gaussian_crps)  # over cells
        )(mean, jnp.sqrt(var), jnp.broadcast_to(obs, (m, c, r_obs, t)))
        raw = 1.0 / score  # (M, C, T)
        w_t = raw / jnp.sum(raw, axis=0, keepdims=True)
        w = jnp.mean(w_t, axis=2)  # (M, C)
        bary_mean = jnp.sum(w[:, :, None] * mean, axis=0)  # (C, T)
        bary_std = jnp.sum(w[:, :, None] * jnp.sqrt(var), axis=0)
        return bary_mean, bary_std, w

    step = jax.jit(gridded_experiment)

    def sync(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf)

    b_j = jnp.asarray(block)
    o_j = jnp.asarray(obs)
    t0 = time.perf_counter()
    sync(step(b_j, o_j))
    print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    out = step(b_j, o_j)
    sync(out)
    elapsed = time.perf_counter() - t0
    bary_mean = np.asarray(out[0])
    assert np.isfinite(bary_mean).all()
    print(json.dumps({
        "metric": f"gridded_fit_ensemble_{m}x{c}cells_{n_iters}iters",
        "value": round(elapsed, 3),
        "unit": "s",
        "v5e8_estimate": round(elapsed / 8, 3),
    }))


if __name__ == "__main__":
    main()
