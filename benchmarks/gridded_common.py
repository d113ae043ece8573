"""Shared workload definition for the gridded benchmark and its CPU oracle.

Both ``gridded_bench.py`` (TPU f32) and ``gridded_oracle.py`` (CPU f64) build
the exact same synthetic CMIP6-scale gridded dataset from the same seed and
run the same fused per-cell pipeline, so their posterior moments are directly
comparable pointwise (BASELINE.json parity demand; VERDICT r1 item 1 noted
the gridded path had no oracle at all).
"""

import numpy as np

M, R, T, R_OBS = 5, 10, 86, 10
SEED = 0


def make_workload(n_cells: int, dtype=np.float32):
    """Deterministic synthetic (block (M,C,R,T), obs (C,R_obs,T)).

    The first ``n_cells`` cells of the full grid are identical regardless of
    grid size: every cell's data is generated from its own counter-based
    substream, so the oracle's cell subset matches the bench's cells exactly.
    """
    signal = np.sin(np.linspace(0, 3, T))
    block = np.empty((M, n_cells, R, T), dtype=dtype)
    obs = np.empty((n_cells, R_OBS, T), dtype=dtype)
    for c in range(n_cells):
        rng = np.random.default_rng(SEED + 1000 + c)
        block[:, c] = signal + 0.3 * rng.normal(size=(M, R, T))
        obs[c] = signal + 0.3 * rng.normal(size=(R_OBS, T))
    return block, obs


def gridded_experiment(blocks, obs, n_iters: int):
    """(M,C,R,T) blocks + (C,R_obs,T) obs -> per-cell barycentre moments.

    Thin wrapper over the LIBRARY's gridded pipeline
    (parallel/gridded.gridded_ensemble_step, weight_kind="crps") so the
    benchmark and its CPU oracle validate exactly the code path users run.
    Returns (bary_mean (C,T), bary_std (C,T), w (M,C)).
    """
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.parallel.gridded import gridded_ensemble_step

    m, c, r, _ = blocks.shape
    return gridded_ensemble_step(
        jnp.asarray(blocks),
        jnp.asarray(obs),
        jnp.ones((m, c, r), bool),
        n_optim_nits=n_iters,
    )
