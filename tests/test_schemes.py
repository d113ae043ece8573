"""Ensemble-scheme tests: barycentre, multi-model mean, weighted mean."""

import numpy as np
import pytest

import bayesian_ensembling_tpu as bet
from bayesian_ensembling_tpu.data import ProcessModel
from bayesian_ensembling_tpu.models.mean_field import MeanField

from test_data import make_collection, make_da


def fitted_collection(rng, n_models=3, n_months=20):
    mc = make_collection(rng, n_models=n_models, n_reals=(2, 4), n_months=n_months)
    mc.fit(MeanField(dtype=np.float64))
    return mc


def test_barycentre_equal_weights_equal_gaussians(rng):
    # Identity property: equal weights over identical posteriors => identity.
    da = make_da(rng, n_reals=3, n_months=10)
    models = [ProcessModel(da.copy(), f"m{i}") for i in range(3)]
    mc = bet.ModelCollection(models)
    mc.fit(MeanField(dtype=np.float64))
    w = bet.UniformWeight()(mc)
    post = bet.Barycentre()(mc, w)
    np.testing.assert_allclose(
        np.asarray(post.gaussian.mean), da.values.mean(0), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(post.gaussian.var), da.values.var(0), rtol=1e-6
    )


def test_barycentre_is_weighted_moments(rng):
    mc = fitted_collection(rng)
    w = bet.UniformWeight()(mc)
    post = bet.Barycentre()(mc, w)
    means = np.stack([np.asarray(pm.distribution.gaussian.mean) for pm in mc])
    stds = np.stack([np.sqrt(np.asarray(pm.distribution.gaussian.var)) for pm in mc])
    np.testing.assert_allclose(np.asarray(post.gaussian.mean), means.mean(0), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(post.gaussian.var), stds.mean(0) ** 2, rtol=1e-6
    )


def test_barycentre_requires_fit(rng):
    mc = make_collection(rng, n_models=2, n_months=10)
    w = bet.UniformWeight()(mc)
    with pytest.raises(AttributeError, match="No posterior"):
        bet.Barycentre()(mc, w)


def test_barycentre_single_weight_broadcast(rng):
    mc = fitted_collection(rng, n_models=3, n_months=15)
    w = bet.ModelSimilarityWeight()(mc, mode="single")  # ("model",)
    post = bet.Barycentre()(mc, w)
    assert np.asarray(post.gaussian.mean).shape == (15,)


def test_barycentre_compat_fixed_point(rng):
    mc = fitted_collection(rng, n_months=8)
    w = bet.UniformWeight()(mc)
    post = bet.Barycentre()(mc, w, compat_fixed_point=True)
    # With sum w*s < 1 the reference quirk gives var = sum(w*s) (not squared).
    stds = np.stack([np.sqrt(np.asarray(pm.distribution.gaussian.var)) for pm in mc])
    s = stds.mean(0)
    expected_var = np.where(s < 1 + 1e-6, s, s**2)
    np.testing.assert_allclose(np.asarray(post.gaussian.var), expected_var, rtol=1e-4)


def test_multi_model_mean(rng):
    mc = fitted_collection(rng)
    post = bet.MultiModelMean()(mc)
    pooled = np.concatenate([pm.data.values for pm in mc], axis=0)
    np.testing.assert_allclose(np.asarray(post.gaussian.mean), pooled.mean(0), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(post.gaussian.var), pooled.var(0), rtol=1e-6)


def test_weighted_model_mean(rng):
    mc = fitted_collection(rng)
    w = bet.UniformWeight()(mc)
    post = bet.WeightedModelMean()(mc, w)
    mus = np.stack([pm.mean_across_realisations.values for pm in mc])
    varis = np.stack([pm.std_across_realisations.values ** 2 for pm in mc])
    m = len(mc)
    np.testing.assert_allclose(np.asarray(post.gaussian.mean), mus.mean(0), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(post.gaussian.var), (varis / m**2).sum(0), rtol=1e-6
    )


def test_scheme_posterior_template(rng):
    mc = fitted_collection(rng, n_months=12)
    post = bet.MultiModelMean()(mc)
    assert post.mean.dims == ("time",)
    assert post.mean.shape == (12,)


def test_scheme_plot_helper(rng):
    # Scheme-level mean±sigma plot (reference ensemble_scheme.py:83-100).
    mc = fitted_collection(rng)
    scheme = bet.Barycentre()
    with pytest.raises(AttributeError):
        scheme.plot()
    w = bet.UniformWeight()(mc)
    scheme(mc, w)
    ax = scheme.plot()
    assert len(ax.lines) == 1
    assert len(ax.collections) == 1  # the fill_between band
