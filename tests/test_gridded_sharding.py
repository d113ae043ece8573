"""Cells-sharded gridded emulation on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from bayesian_ensembling_tpu.parallel.gridded import pad_cells, sharded_gridded_marginals
from bayesian_ensembling_tpu.parallel.step import emulate_marginals


def test_pad_cells(rng):
    block = rng.normal(size=(10, 2, 6))
    mask = np.ones((10, 2), bool)
    pb, pm, orig = pad_cells(block, mask, 8)
    assert pb.shape == (16, 2, 6) and orig == 10
    np.testing.assert_allclose(pb[10:], np.repeat(block[:1], 6, axis=0))
    pb2, _, _ = pad_cells(block[:8], mask[:8], 8)
    assert pb2.shape == (8, 2, 6)


def test_sharded_matches_unsharded(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    c, r, t = 16, 3, 10
    block = jnp.asarray(rng.normal(size=(c, r, t)))
    mask = jnp.ones((c, r), bool)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("cells",))
    got_mean, got_var = sharded_gridded_marginals(
        mesh, block, mask, n_optim_nits=4, dba_iterations=2
    )
    want_mean, want_var = emulate_marginals(
        block, mask, n_optim_nits=4, dba_iterations=2
    )
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(want_mean), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_var), np.asarray(want_var), rtol=2e-5)


def test_2d_mesh_gridded_step_matches_unsharded():
    """2-D (model x cells) mesh step == unsharded gridded ensemble step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from jax.sharding import Mesh

    from bayesian_ensembling_tpu.parallel.gridded import (
        gridded_ensemble_step,
        make_sharded_gridded_step,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    m, c, r, t, r_obs = 4, 8, 3, 12, 5
    block = jnp.asarray(rng.normal(size=(m, c, r, t)).astype(np.float32))
    obs = jnp.asarray(rng.normal(size=(c, r_obs, t)).astype(np.float32))
    mask = jnp.ones((m, c, r), bool)
    model_mask = jnp.ones((m,), jnp.float32)

    want = jax.jit(
        lambda b, o, mk, mm: gridded_ensemble_step(
            b, o, mk, mm, n_optim_nits=3, dba_iterations=2
        )
    )(block, obs, mask, model_mask)

    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), axis_names=("model", "cells")
    )
    step = make_sharded_gridded_step(mesh, n_optim_nits=3, dba_iterations=2)
    got = step(block, obs, mask, model_mask)

    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-7
        )
    # weights sum to one over models, per cell
    np.testing.assert_allclose(
        np.asarray(got[2]).sum(axis=0), np.ones(c), rtol=1e-5
    )


def test_gridded_similarity_single_is_spatial_mode(rng):
    """similarity_single inside the per-cell gridded step == the library
    ModelSimilarityWeight(mode='spatial') reduction: one weight per model
    per CELL (constant over time), from the whole-series pairwise W2 at
    that cell — the reference's spatial mode (weights.py:268-300)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesian_ensembling_tpu.parallel.gridded import gridded_ensemble_step
    from bayesian_ensembling_tpu.parallel.step import fused_raw_weights, emulate_marginals

    m, c, r, t, r_obs = 3, 4, 3, 10, 4
    block = jnp.asarray(rng.normal(size=(m, c, r, t)).astype(np.float32))
    obs = jnp.asarray(rng.normal(size=(c, r_obs, t)).astype(np.float32))
    mask = jnp.ones((m, c, r), bool)

    mean, var = emulate_marginals(
        block.reshape(m * c, r, t), mask.reshape(m * c, r),
        n_optim_nits=3, dba_iterations=2,
    )
    mean = mean.reshape(m, c, t)
    var = var.reshape(m, c, t)

    # Per-cell single-mode weights through the fused scorer.
    raw = jax.vmap(
        lambda mu, v, o: fused_raw_weights("similarity_single", mu, v, o),
        in_axes=(1, 1, 0), out_axes=1,
    )(mean, var, obs)  # (M, C, T)
    w = np.asarray(raw / raw.sum(axis=0, keepdims=True))
    # Constant over time within each cell (spatial mode's defining shape).
    assert np.allclose(w, w[:, :, :1], atol=1e-6)

    # Hand-computed spatial reduction from the same marginals: per cell,
    # pair W2 = ||d_mu||_2 over time + sum_t (d_sd)^2, mean over j.
    mu = np.asarray(mean)
    sd = np.sqrt(np.asarray(var))
    for cc in range(c):
        pair = np.zeros((m, m))
        for i in range(m):
            for j in range(m):
                pair[i, j] = np.linalg.norm(mu[i, cc] - mu[j, cc]) + np.sum(
                    (sd[i, cc] - sd[j, cc]) ** 2
                )
        vec = pair.mean(axis=1)
        vec = vec / vec.sum()
        np.testing.assert_allclose(w[:, cc, 0], vec, rtol=1e-5)

    # And the full gridded step runs with it end-to-end.
    bm, bs, wg = gridded_ensemble_step(
        block, obs, mask, weight_kind="similarity_single",
        n_optim_nits=3, dba_iterations=2,
    )
    assert np.isfinite(np.asarray(bm)).all()
    np.testing.assert_allclose(np.asarray(wg).sum(axis=0), np.ones(c), rtol=1e-5)


def test_sharded_marginals_with_gp_init_matches_unsharded(rng):
    """The coarse-to-fine warm start must work through the sharded path:
    gp_init is a traced, cells-sharded argument — never part of the
    program-cache key (array-valued kwargs are unhashable)."""
    from bayesian_ensembling_tpu.ops.gp import init_params

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    c, r, t = 16, 3, 10
    block = jnp.asarray(rng.normal(size=(c, r, t)))
    mask = jnp.ones((c, r), bool)
    base = init_params(lengthscale=2.0, variance=1.5, dtype=block.dtype)
    gp_init = jax.tree.map(lambda p: jnp.full((c,), p), base)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("cells",))
    got = sharded_gridded_marginals(
        mesh, block, mask, gp_init=gp_init, n_optim_nits=4, dba_iterations=2
    )
    want = emulate_marginals(
        block, mask, gp_init=gp_init, n_optim_nits=4, dba_iterations=2
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-5)


def test_2d_mesh_step_with_warm_start_matches_unsharded(rng):
    """make_sharded_gridded_step(with_gp_init=True) == the unsharded warm
    fine pass, with the coarse fit itself sharded over the cells axis."""
    from bayesian_ensembling_tpu.parallel.gridded import (
        coarse_warm_start,
        gridded_ensemble_step,
        make_sharded_gridded_step,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    la, lo = 2, 4
    m, c, r, t, r_obs = 2, la * lo, 3, 12, 4
    block = jnp.asarray(rng.normal(size=(m, c, r, t)).astype(np.float32))
    obs = jnp.asarray(rng.normal(size=(c, r_obs, t)).astype(np.float32))
    mask = jnp.ones((m, c, r), bool)
    model_mask = jnp.ones((m,), jnp.float32)
    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), axis_names=("model", "cells")
    )

    gp_init = coarse_warm_start(block, mask, la, lo, 2, n_optim_nits=5)
    gp_init_sharded = coarse_warm_start(
        block, mask, la, lo, 2, n_optim_nits=5, mesh=mesh
    )
    for a, b in zip(jax.tree.leaves(gp_init), jax.tree.leaves(gp_init_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5)

    want = gridded_ensemble_step(
        block, obs, mask, model_mask, n_optim_nits=3, dba_iterations=2,
        gp_init=gp_init,
    )
    step = make_sharded_gridded_step(
        mesh, n_optim_nits=3, dba_iterations=2, with_gp_init=True
    )
    got = step(block, obs, mask, model_mask, gp_init)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-7
        )
