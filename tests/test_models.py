"""Emulator tests: mean-field and GPDTW1D (batched)."""

import numpy as np
import pytest

from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D
from bayesian_ensembling_tpu.models.mean_field import MeanField
from bayesian_ensembling_tpu.ops.distributions import DiagGaussian, FullCovGaussian

from test_data import make_collection, make_da


def test_mean_field_closed_form(rng):
    mc = make_collection(rng, n_models=2, n_reals=(5, 7), n_months=24)
    MeanField(dtype=np.float64).fit_collection(mc) and None
    posts = MeanField(dtype=np.float64).fit_collection(mc)
    for pm, post in zip(mc, posts):
        assert isinstance(post.gaussian, DiagGaussian)
        vals = pm.data.values
        np.testing.assert_allclose(
            np.asarray(post.gaussian.mean), vals.mean(0), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(post.gaussian.var), vals.var(0), rtol=1e-10
        )


def test_mean_field_adam_stays_near_mle(rng):
    mc = make_collection(rng, n_models=2, n_reals=(6,), n_months=12)
    posts = MeanField(dtype=np.float64).fit_collection(mc, n_optim_nits=200)
    for pm, post in zip(mc, posts):
        vals = pm.data.values
        np.testing.assert_allclose(
            np.asarray(post.gaussian.mean), vals.mean(0), atol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(post.gaussian.var), vals.var(0), rtol=0.3
        )


def test_collection_fit_attaches_posteriors(rng):
    mc = make_collection(rng, n_models=3, n_months=18)
    mc.fit(MeanField(dtype=np.float64))
    for pm in mc:
        assert pm.distribution is not None


def test_gpdtw1d_fit_collection(rng):
    mc = make_collection(rng, n_models=3, n_reals=(2, 4, 3), n_months=30)
    posts = GPDTW1D(dtype=np.float64).fit_collection(
        mc, n_optim_nits=30, dba_iterations=3
    )
    t = 30
    for pm, post in zip(mc, posts):
        g = post.gaussian
        assert isinstance(g, FullCovGaussian)
        assert g.mean.shape == (t,)
        assert g.cov.shape == (t, t)
        var = np.asarray(g.variance)
        assert (var > 0).all()
        # Posterior variance includes the heteroskedastic noise floor.
        y_var = pm.data.values.var(axis=0)
        assert (var >= y_var * 0.5).all()
        # Posterior mean tracks the realisation envelope.
        lo = pm.data.values.min() - 1.0
        hi = pm.data.values.max() + 1.0
        mean = np.asarray(g.mean)
        assert (mean > lo).all() and (mean < hi).all()


def test_gpdtw1d_chunked_fit_matches_merged(rng):
    """fit_chunk_steps (bounded-execution host loop) == the merged program."""
    mc = make_collection(rng, n_models=3, n_reals=(2, 4, 3), n_months=30)
    merged = GPDTW1D(dtype=np.float64).fit_collection(
        mc, n_optim_nits=30, dba_iterations=3
    )
    chunked = GPDTW1D(dtype=np.float64).fit_collection(
        mc, n_optim_nits=30, dba_iterations=3, fit_chunk_steps=8
    )
    for a, b in zip(merged, chunked):
        np.testing.assert_allclose(
            np.asarray(a.gaussian.mean), np.asarray(b.gaussian.mean), rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(a.gaussian.cov),
            np.asarray(b.gaussian.cov),
            rtol=1e-7,
            atol=1e-10,
        )


def test_gpdtw1d_rejects_spatial_data(rng):
    da = make_da(rng, n_reals=2, n_months=12, spatial=(3,))
    mc = ModelCollection([ProcessModel(da, "m")])
    with pytest.raises(NotImplementedError):
        GPDTW1D().fit_collection(mc)


def test_gpdtw1d_single_model_fit_matches_collection(rng):
    da = make_da(rng, n_reals=3, n_months=20)
    pm = ProcessModel(da, "m")
    post1 = GPDTW1D(dtype=np.float64).fit(pm, n_optim_nits=10, dba_iterations=2)
    mc = ModelCollection([ProcessModel(da, "m")])
    post2 = GPDTW1D(dtype=np.float64).fit_collection(mc, n_optim_nits=10, dba_iterations=2)[0]
    np.testing.assert_allclose(
        np.asarray(post1.gaussian.mean), np.asarray(post2.gaussian.mean), rtol=1e-8
    )


def test_gpdtw1d_padding_invariance(rng):
    """A model batched with a larger-R model must get the same posterior as
    when fitted alone (zero-pad + mask correctness end-to-end)."""
    da_small = make_da(rng, n_reals=2, n_months=16)
    da_big = make_da(rng, n_reals=5, n_months=16)
    alone = GPDTW1D(dtype=np.float64).fit_collection(
        ModelCollection([ProcessModel(da_small, "s")]),
        n_optim_nits=15,
        dba_iterations=2,
    )[0]
    together = GPDTW1D(dtype=np.float64).fit_collection(
        ModelCollection([ProcessModel(da_small, "s"), ProcessModel(da_big, "b")]),
        n_optim_nits=15,
        dba_iterations=2,
    )[0]
    np.testing.assert_allclose(
        np.asarray(alone.gaussian.mean),
        np.asarray(together.gaussian.mean),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(alone.gaussian.cov),
        np.asarray(together.gaussian.cov),
        rtol=1e-5,
        atol=1e-10,
    )


def test_meanfield_single_realisation_variance_floor(rng):
    """An R=1 member's closed-form variance is floored above zero so
    sigma-dividing weighters stay finite for the whole collection."""
    import bayesian_ensembling_tpu as bet
    from test_data import make_collection, make_da
    from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
    from bayesian_ensembling_tpu.models.mean_field import MeanField

    mc = ModelCollection(
        [
            ProcessModel(make_da(rng, n_reals=1, n_months=12), "single"),
            ProcessModel(make_da(rng, n_reals=3, n_months=12), "multi"),
        ]
    )
    mc.fit(MeanField(dtype=np.float64), n_optim_nits=0)
    assert (np.asarray(mc[0].distribution.gaussian.variance) > 0).all()
    obs = ProcessModel(make_da(rng, n_reals=2, n_months=12), "obs")
    w = bet.CRPSWeight()(mc, obs)
    assert np.isfinite(np.asarray(w.values)).all()
    np.testing.assert_allclose(np.asarray(w.values).sum(axis=0), 1.0, rtol=1e-6)
