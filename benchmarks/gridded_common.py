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

    Emulate every (model, cell) GP in one program, CRPS-weight per cell,
    W2-barycentre per cell.  Returns (bary_mean (C,T), bary_std (C,T), w (M,C)).
    """
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.ops import scoring
    from bayesian_ensembling_tpu.parallel.step import emulate_marginals

    m, c, r, t = blocks.shape
    mean, var = emulate_marginals(
        blocks.reshape(m * c, r, t),
        jnp.ones((m * c, r), bool),
        n_optim_nits=n_iters,
    )
    mean = mean.reshape(m, c, t)
    var = var.reshape(m, c, t)
    score = jax.vmap(  # over models
        jax.vmap(scoring.mean_gaussian_crps)  # over cells
    )(mean, jnp.sqrt(var), jnp.broadcast_to(obs, (m,) + obs.shape))
    raw = 1.0 / score  # (M, C, T)
    w_t = raw / jnp.sum(raw, axis=0, keepdims=True)
    w = jnp.mean(w_t, axis=2)  # (M, C)
    bary_mean = jnp.sum(w[:, :, None] * mean, axis=0)  # (C, T)
    bary_std = jnp.sum(w[:, :, None] * jnp.sqrt(var), axis=0)
    return bary_mean, bary_std, w
