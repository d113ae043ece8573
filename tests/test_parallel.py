"""Sharded fused-step tests on the 8-device virtual CPU mesh."""

import functools
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from bayesian_ensembling_tpu.parallel.step import (
    ensemble_scenario_step,
    make_sharded_step,
    pad_models,
)


def toy(m=8, r=3, t_hist=20, t_ssp=10, r_obs=4, seed=0):
    rng = np.random.default_rng(seed)
    hb = rng.normal(size=(m, r, t_hist))
    hm = np.ones((m, r), dtype=bool)
    sb = rng.normal(size=(m, r, t_ssp))
    sm = hm.copy()
    obs = rng.normal(size=(r_obs, t_hist))
    return hb, hm, sb, sm, obs


def test_unsharded_step(rng):
    hb, hm, sb, sm, obs = toy()
    mean, std, w = ensemble_scenario_step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), n_optim_nits=3, dba_iterations=2,
    )
    assert mean.shape == (10,) and std.shape == (10,) and w.shape == (8,)
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-6)
    assert np.isfinite(np.asarray(mean)).all()


def test_sharded_step_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    hb, hm, sb, sm, obs = toy()
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("model",))
    mm = np.ones(8)
    step = make_sharded_step(mesh, n_optim_nits=3, dba_iterations=2)
    got = step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), jnp.asarray(mm),
    )
    want = ensemble_scenario_step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), jnp.asarray(mm), n_optim_nits=3, dba_iterations=2,
    )
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=2e-4, atol=1e-7)


@pytest.mark.parametrize("optimizer", ["adam", "bfgs"])
def test_sharded_step_warm_time_matches_unsharded(optimizer):
    """Coarse-to-fine-in-time composes with the model-sharded step: the
    time axis is unsharded, so the stride slice is device-local and the
    sharded result equals the unsharded one.  The bfgs variant additionally
    checks the per-model quasi-Newton state (Hessian, damping, pending
    pair, accept flags) shards cleanly along the model axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    hb, hm, sb, sm, obs = toy()
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("model",))
    mm = np.ones(8)
    kw = dict(n_optim_nits=3, dba_iterations=2, time_stride=2, fine_steps=2,
              optimizer=optimizer)
    step = make_sharded_step(mesh, **kw)
    got = step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), jnp.asarray(mm),
    )
    want = ensemble_scenario_step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), jnp.asarray(mm), **kw,
    )
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=2e-4, atol=1e-7)


def test_model_padding_neutral():
    hb, hm, sb, sm, obs = toy(m=6)
    base = ensemble_scenario_step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), n_optim_nits=3, dba_iterations=2,
    )
    hb8, hm8, mmask = pad_models(hb, hm, 8)
    sb8, sm8, _ = pad_models(sb, sm, 8)
    padded = ensemble_scenario_step(
        jnp.asarray(hb8), jnp.asarray(hm8), jnp.asarray(sb8), jnp.asarray(sm8),
        jnp.asarray(obs), jnp.asarray(mmask), n_optim_nits=3, dba_iterations=2,
    )
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(padded[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(base[1]), np.asarray(padded[1]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(base[2]), np.asarray(padded[2][:6]), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(padded[2][6:]), 0.0, atol=1e-12)


def test_loglik_weight_kind():
    hb, hm, sb, sm, obs = toy(m=4)
    mean, std, w = ensemble_scenario_step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), n_optim_nits=3, dba_iterations=2, weight_kind="loglik",
    )
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-6)


def test_graft_entry_single_chip():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    mod.dryrun_multichip(min(8, len(jax.devices())))


@pytest.mark.parametrize(
    "kind",
    [
        "crps",
        "loglik",
        "ksd",
        "inverse_square",
        "uniform",
        "similarity",
        "similarity_single",
    ],
)
def test_all_weight_kinds_unsharded(kind):
    hb, hm, sb, sm, obs = toy()
    mean, std, w = ensemble_scenario_step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), n_optim_nits=3, dba_iterations=2, weight_kind=kind,
    )
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-6)
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(w)).all()


@pytest.mark.parametrize(
    "kind", ["ksd", "similarity", "similarity_single", "inverse_square", "uniform"]
)
def test_sharded_matches_unsharded_all_kinds(kind):
    """Every fused weighter gives identical results sharded vs unsharded —
    VERDICT r1 item 4 (was CRPS/loglik only)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    hb, hm, sb, sm, obs = toy()
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("model",))
    mm = np.ones(8)
    step = make_sharded_step(
        mesh, n_optim_nits=3, dba_iterations=2, weight_kind=kind
    )
    got = step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), jnp.asarray(mm),
    )
    want = ensemble_scenario_step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), jnp.asarray(mm),
        n_optim_nits=3, dba_iterations=2, weight_kind=kind,
    )
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=2e-4, atol=1e-7)


def test_fused_weights_match_library_path(rng):
    """fused_raw_weights + normalisation == the library weighters on the
    same diagonal posteriors (crps/loglik/ksd/inverse_square/uniform) and
    temporal-mode similarity."""
    import bayesian_ensembling_tpu as bet
    from bayesian_ensembling_tpu.coords import DimArray
    from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
    from bayesian_ensembling_tpu.models.mean_field import MeanField
    from bayesian_ensembling_tpu.parallel.step import fused_raw_weights

    m, r, t, r_obs = 4, 3, 15, 5
    time = np.arange(t)
    models = []
    for i in range(m):
        vals = rng.normal(size=(r, t))
        da = DimArray(vals, ("realisation", "time"), {"time": time})
        models.append(ProcessModel(da, f"m{i}"))
    mc = ModelCollection(models)
    mc.fit(MeanField(dtype=np.float64))
    obs_da = DimArray(rng.normal(size=(r_obs, t)), ("realisation", "time"), {"time": time})
    obs_pm = ProcessModel(obs_da, "obs")

    means = jnp.stack([pm.distribution.gaussian.mean for pm in mc])
    varis = jnp.stack([jnp.asarray(pm.distribution.gaussian.variance) for pm in mc])
    obs = jnp.asarray(obs_da.values)
    block, mask = mc.padded_stack(dtype=np.float64)

    cases = {
        "crps": bet.CRPSWeight()(mc, obs_pm),
        "loglik": bet.LogLikelihoodWeight()(mc, obs_pm),
        "ksd": bet.KSDWeight()(mc, obs_pm),
        "inverse_square": bet.InverseSquareWeight()(mc, obs_pm),
        "uniform": bet.UniformWeight()(mc),
        "similarity": bet.ModelSimilarityWeight()(mc, mode="temporal"),
        "similarity_single": bet.ModelSimilarityWeight()(mc, mode="single"),
    }
    for kind, lib in cases.items():
        raw = np.asarray(
            fused_raw_weights(
                kind, means, varis, obs, jnp.asarray(block), jnp.asarray(mask)
            )
        )
        fused = raw / raw.sum(axis=0, keepdims=True)
        lib_vals = np.asarray(lib.values)
        if kind == "similarity_single":
            # Library single mode returns one dimensionless weight per
            # model; the fused path broadcasts that weight over T.
            assert np.allclose(fused, fused[:, :1]), "single mode not constant in t"
            fused = fused[:, 0]
        np.testing.assert_allclose(
            fused, lib_vals, rtol=1e-6, atol=1e-10,
            err_msg=f"fused {kind} != library path",
        )


def test_sharded_multi_scenario_matches_unsharded():
    """The headline bench's multi-chip form: scenario axis batched, model
    axis sharded — must equal the unsharded merged program."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from bayesian_ensembling_tpu.parallel.step import (
        ensemble_multi_scenario_step,
        make_sharded_multi_scenario_step,
    )

    rng = np.random.default_rng(0)
    s, m, r, th, ts, ro = 3, 8, 3, 18, 10, 4
    hb = jnp.asarray(rng.normal(size=(s, m, r, th)).astype(np.float32))
    hm = jnp.ones((s, m, r), bool)
    sb = jnp.asarray(rng.normal(size=(s, m, r, ts)).astype(np.float32))
    sm_ = jnp.ones((s, m, r), bool)
    obs = jnp.asarray(rng.normal(size=(ro, th)).astype(np.float32))
    mm = jnp.ones((s, m), jnp.float32)

    want = jax.jit(
        functools.partial(
            ensemble_multi_scenario_step, n_optim_nits=3, dba_iterations=2
        )
    )(hb, hm, sb, sm_, obs, mm)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("model",))
    step = make_sharded_multi_scenario_step(mesh, n_optim_nits=3, dba_iterations=2)
    got = step(hb, hm, sb, sm_, obs, mm)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got[2]).sum(axis=1), np.ones(s), rtol=1e-5)


def test_scenario_model_2d_mesh_matches_unsharded():
    """2-D (scenario x model) mesh: scenarios are collective-free DP, the
    model axis keeps its weight/barycentre psums — must equal the unsharded
    merged program."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from bayesian_ensembling_tpu.parallel.step import (
        ensemble_multi_scenario_step,
        make_sharded_multi_scenario_step,
    )

    rng = np.random.default_rng(7)
    s, m, r, th, ts, ro = 2, 4, 3, 18, 10, 4
    hb = jnp.asarray(rng.normal(size=(s, m, r, th)).astype(np.float32))
    hm = jnp.ones((s, m, r), bool)
    sb = jnp.asarray(rng.normal(size=(s, m, r, ts)).astype(np.float32))
    sm_ = jnp.ones((s, m, r), bool)
    obs = jnp.asarray(rng.normal(size=(ro, th)).astype(np.float32))
    mm = jnp.ones((s, m), jnp.float32)

    want = jax.jit(
        functools.partial(
            ensemble_multi_scenario_step, n_optim_nits=3, dba_iterations=2
        )
    )(hb, hm, sb, sm_, obs, mm)

    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4),
        axis_names=("scenario", "model"),
    )
    step = make_sharded_multi_scenario_step(
        mesh, scenario_axis="scenario", n_optim_nits=3, dba_iterations=2
    )
    got = step(hb, hm, sb, sm_, obs, mm)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got[2]).sum(axis=1), np.ones(s), rtol=1e-5)


def test_fused_loglik_no_underflow(rng):
    """Tight posteriors push diag log-likelihoods far below the f32 exp
    underflow point; the fused loglik scorer must stay finite (the library
    path's softmax fix, weights.py)."""
    from bayesian_ensembling_tpu.parallel.step import fused_raw_weights

    m, t, ro = 3, 6, 4
    mean = jnp.asarray(rng.normal(size=(m, t)).astype(np.float32))
    var = jnp.full((m, t), 1e-6, jnp.float32)  # tight -> ll ~ -1e6
    obs = jnp.asarray(mean[0] + 2.0)[None, :] * jnp.ones((ro, 1), jnp.float32)
    raw = fused_raw_weights("loglik", mean, var, obs)
    w = raw / jnp.sum(raw, axis=0, keepdims=True)
    assert np.isfinite(np.asarray(w)).all()
    np.testing.assert_allclose(np.asarray(w).sum(axis=0), np.ones(t), rtol=1e-5)


def test_fused_reciprocal_scorers_survive_exact_match(rng):
    """A model marginal EXACTLY equal to the obs mean (constant/synthetic
    data) must not NaN-poison the scenario: the reciprocal scorers floor
    the score (at sqrt(tiny)) instead of producing inf."""
    from bayesian_ensembling_tpu.parallel.step import fused_raw_weights

    m, r, t, ro = 3, 2, 6, 4
    obs = jnp.asarray(rng.normal(size=(ro, t)).astype(np.float32))
    obs_mean = jnp.mean(obs, axis=0)
    block = jnp.asarray(rng.normal(size=(m, r, t)).astype(np.float32))
    # Model 0's realisations average EXACTLY to the obs mean everywhere.
    block = block.at[0, 0].set(obs_mean)
    block = block.at[0, 1].set(obs_mean)
    mask = jnp.ones((m, r), bool)
    raw = fused_raw_weights(
        "inverse_square", block[:, 0], jnp.ones((m, t)), obs,
        hist_block=block, hist_mask=mask,
    )
    w = raw / jnp.sum(raw, axis=0, keepdims=True)
    assert np.isfinite(np.asarray(w)).all()
    # The exact-match model dominates (its floored score is the smallest).
    assert np.all(np.asarray(w)[0] > 0.99)


def test_fused_reciprocal_floor_many_floored_models_sum_to_one(rng):
    """FOUR-plus models all floored at the same timestep: a tiny-valued
    floor would make each raw weight 1/tiny = 8.5e37, the per-timestep SUM
    overflow to inf in f32, and the normalisation silently zero EVERY
    weight there.  The sqrt(tiny) floor keeps the sum finite and the
    floored models split the weight equally."""
    from bayesian_ensembling_tpu.parallel.step import fused_raw_weights

    m, r, t, ro = 5, 2, 6, 4
    obs = jnp.asarray(rng.normal(size=(ro, t)).astype(np.float32))
    obs_mean = jnp.mean(obs, axis=0)
    block = jnp.asarray(rng.normal(size=(m, r, t)).astype(np.float32))
    for i in range(4):  # models 0..3 all match the obs mean exactly
        block = block.at[i, 0].set(obs_mean)
        block = block.at[i, 1].set(obs_mean)
    mask = jnp.ones((m, r), bool)
    raw = fused_raw_weights(
        "inverse_square", block[:, 0], jnp.ones((m, t)), obs,
        hist_block=block, hist_mask=mask,
    )
    assert np.isfinite(np.asarray(raw)).all()  # no inf in the raw weights
    w = np.asarray(raw / jnp.sum(raw, axis=0, keepdims=True))
    assert np.isfinite(w).all()
    np.testing.assert_allclose(w.sum(axis=0), np.ones(t), rtol=1e-5)
    np.testing.assert_allclose(w[:4], 0.25, rtol=1e-4)  # equal split
    assert np.all(w[4] < 1e-6)  # the non-matching model is negligible


def test_fused_loglik_padded_model_excluded_from_max_shift(rng):
    """A junk padded model with a spuriously HIGH log-likelihood must not
    shrink the real models' exp(ll - max) headroom: the max-shift is taken
    over real models only (ADVICE r2: model_mask applied before the max)."""
    from bayesian_ensembling_tpu.parallel.step import fused_raw_weights

    m, t, ro = 4, 6, 3
    mean = jnp.asarray(rng.normal(size=(m, t)).astype(np.float32))
    # Real models: tight posteriors far from obs -> very negative ll.
    var = jnp.full((m, t), 1e-6, jnp.float32)
    obs = jnp.asarray(mean[0] + 2.0)[None, :] * jnp.ones((ro, 1), jnp.float32)
    # Padded model 3: posterior exactly on obs with moderate variance -> its
    # ll is enormously higher than every real model's.
    mean = mean.at[3].set(obs[0])
    var = var.at[3].set(1.0)
    model_mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])

    raw = fused_raw_weights("loglik", mean, var, obs, model_mask=model_mask)
    raw = raw * model_mask[:, None]
    w = np.asarray(raw / jnp.sum(raw, axis=0, keepdims=True))
    assert np.isfinite(w).all()
    # The padded row is exactly zeroed; the real rows still normalise.
    np.testing.assert_allclose(w[3], np.zeros(t), atol=0.0)
    np.testing.assert_allclose(w[:3].sum(axis=0), np.ones(t), rtol=1e-5)
    # Without the fix the junk row's ll dominates the max and every real
    # row underflows to zero -> 0/0 NaNs. Reproduce that the shift is
    # keyed on the REAL max: at least one real row must be ~1 pre-norm.
    assert np.asarray(raw).max() > 0.5


def test_fused_mixture_sigma_matches_library(rng):
    """sigma_mode='mixture' in the fused step == the library Barycentre's
    mixture moments on the same marginals; sharded == unsharded."""
    hb, hm, sb, sm, obs = toy(m=8)
    kw = dict(n_optim_nits=3, dba_iterations=2, weight_kind="crps")
    mean_w2, std_w2, w = ensemble_scenario_step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), **kw,
    )
    mean_mx, std_mx, w2 = ensemble_scenario_step(
        jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
        jnp.asarray(obs), sigma_mode="mixture", **kw,
    )
    np.testing.assert_allclose(np.asarray(mean_mx), np.asarray(mean_w2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), rtol=1e-6)
    # mixture adds nonnegative spread
    assert np.all(np.asarray(std_mx) >= np.asarray(std_w2) - 1e-7)

    if len(jax.devices()) >= 8:
        mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("model",))
        step = make_sharded_step(mesh, sigma_mode="mixture", **kw)
        got = step(
            jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
            jnp.asarray(obs), jnp.ones(8),
        )
        mm = ensemble_scenario_step(
            jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
            jnp.asarray(obs), jnp.ones(8), sigma_mode="mixture", **kw,
        )
        for g, want in zip(got, mm):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(want), rtol=2e-4, atol=1e-7
            )

    with pytest.raises(ValueError, match="sigma_mode"):
        ensemble_scenario_step(
            jnp.asarray(hb), jnp.asarray(hm), jnp.asarray(sb), jnp.asarray(sm),
            jnp.asarray(obs), sigma_mode="compat", **kw,
        )


def test_chunked_marginals_pipeline_matches_merged_step():
    """The native-monthly campaign's host-chunked staging (emulate the
    merged batch in model chunks, then multi_scenario_tail) must equal the
    single merged ensemble_multi_scenario_step program — including a chunk
    size that does NOT divide the merged batch (pad-and-slice path)."""
    from bayesian_ensembling_tpu.parallel.step import (
        chunked_marginals,
        emulate_marginals,
        ensemble_multi_scenario_step,
        multi_scenario_tail,
    )

    rng = np.random.default_rng(3)
    s, m, r, th, ts, ro = 2, 5, 3, 16, 9, 4
    hb = jnp.asarray(rng.normal(size=(s, m, r, th)).astype(np.float32))
    hm = jnp.ones((s, m, r), bool)
    sb = jnp.asarray(rng.normal(size=(s, m, r, ts)).astype(np.float32))
    sm_ = jnp.ones((s, m, r), bool)
    obs = jnp.asarray(rng.normal(size=(ro, th)).astype(np.float32))
    mm = jnp.ones((s, m), jnp.float32)

    want = jax.jit(
        functools.partial(
            ensemble_multi_scenario_step, n_optim_nits=3, dba_iterations=2
        )
    )(hb, hm, sb, sm_, obs, mm)

    em = jax.jit(
        functools.partial(emulate_marginals, n_optim_nits=3, dba_iterations=2)
    )
    b = s * m
    # 10 % 4 != 0 exercises the pad-and-slice path; 24 > 2*10 exercises the
    # tiled-filler branch (pad exceeds the real batch).
    for chunk in (4, 10, 24):
        h_mu, h_var = chunked_marginals(
            em, hb.reshape(b, r, th), hm.reshape(b, r), chunk
        )
        s_mu, s_var = em(sb.reshape(b, r, ts), sm_.reshape(b, r))
        got = jax.jit(multi_scenario_tail)(
            h_mu.reshape(s, m, th),
            h_var.reshape(s, m, th),
            s_mu.reshape(s, m, ts),
            s_var.reshape(s, m, ts),
            obs,
            hb,
            hm,
            mm,
        )
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-7
            )


def test_all_ssps_dedup_matches_replicated():
    """The campaign's unique-fit packing (each distinct model emulated once,
    marginals gathered back into the (S, M) layout) must produce the same
    barycentres and weights as the replicated layout that re-fits every
    (scenario, model) slot — scenarios share historical models by
    construction, exactly like the real CMIP6 directories."""
    import importlib.util
    import os

    from bayesian_ensembling_tpu.coords import DimArray
    from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel

    spec = importlib.util.spec_from_file_location(
        "monthly_bench",
        os.path.join(os.path.dirname(__file__), "..", "benchmarks", "monthly_bench.py"),
    )
    mb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mb)

    rng = np.random.default_rng(7)
    t_h, t_s, r = 14, 8, 3
    time_h = (np.datetime64("2000-01", "M") + np.arange(t_h)).astype("datetime64[ns]")
    time_s = (np.datetime64("2010-01", "M") + np.arange(t_s)).astype("datetime64[ns]")

    def pm(name, t, time):
        vals = rng.normal(size=(r, t)).astype(np.float32)
        return ProcessModel(
            DimArray(vals, ("realisation", "time"), {"time": time}, name="tas"), name
        )

    # 4 distinct historical models shared across scenarios; per-scenario
    # SSP runs are distinct.
    hist_pool = {n: pm(n, t_h, time_h) for n in ("a", "b", "c", "d")}
    scenarios = []
    for si, names in enumerate((("a", "b", "c"), ("b", "c", "d"))):
        hists = ModelCollection([hist_pool[n] for n in names])
        ssps = ModelCollection([pm(n, t_s, time_s) for n in names])
        scenarios.append((f"scn{si}", hists, ssps))
    obs = jnp.asarray(rng.normal(size=(4, t_h)).astype(np.float32))

    outs = {}
    for dedup in (True, False):
        run_once, meta = mb.build_all_ssps_runner(
            scenarios, obs, n_iters=3, dba_iters=2, hist_chunk=5, dedup=dedup
        )
        outs[dedup] = [np.asarray(a) for a in run_once()]
    assert outs[False][0].shape == (2, t_s)  # (S, T_ssp) barycentre means
    assert outs[True][0].shape == outs[False][0].shape
    for got, want in zip(outs[True], outs[False]):
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
