"""Coverage for weighting branches: spatial similarity mode, compat flags,
standardisation knobs, GPDTW1D-driven PMT."""

import numpy as np
import pytest

import bayesian_ensembling_tpu as bet
from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
from bayesian_ensembling_tpu.models.gp_3d import GPDTW3D
from bayesian_ensembling_tpu.models.mean_field import MeanField

from test_data import make_collection, make_da
from test_gp3d import make_gridded
from test_weights import setup_fitted


def test_similarity_spatial_mode(rng):
    models = []
    for i in range(3):
        pm = make_gridded(rng, r=2, t=6, la=2, lo=3)
        models.append(ProcessModel(pm.data, f"m{i}"))
    mc = ModelCollection(models)
    mc.fit(MeanField(dtype=np.float64))
    w = bet.ModelSimilarityWeight()(mc, mode="spatial")
    assert w.dims == ("model", "latitude", "longitude")
    assert w.shape == (3, 2, 3)
    np.testing.assert_allclose(w.values.sum(axis=0), 1.0, rtol=1e-6)


def test_similarity_bad_mode(rng):
    mc, _ = setup_fitted(rng)
    with pytest.raises(ValueError, match="single"):
        bet.ModelSimilarityWeight()(mc, mode="bogus")


def test_crps_ksd_compat_variance_as_scale(rng):
    mc, obs = setup_fitted(rng, n_models=2)
    for W in (bet.CRPSWeight, bet.KSDWeight):
        w_fix = W()(mc, obs)
        w_compat = W()(mc, obs, compat_variance_as_scale=True)
        np.testing.assert_allclose(w_fix.values.sum(axis=0), 1.0, rtol=1e-6)
        np.testing.assert_allclose(w_compat.values.sum(axis=0), 1.0, rtol=1e-6)
        # The quirk changes the scores, so the weights must differ.
        assert not np.allclose(w_fix.values, w_compat.values)


def test_loglik_standardisation_constant(rng):
    import jax.numpy as jnp

    mc, obs = setup_fitted(rng, n_models=3)
    w1 = bet.LogLikelihoodWeight()(mc, obs, standardisation_constant=1.0)
    w2 = bet.LogLikelihoodWeight()(mc, obs, standardisation_constant=0.1)
    np.testing.assert_allclose(w2.values.sum(axis=0), 1.0, rtol=1e-6)
    # Weaker constant flattens the weights toward uniform.
    spread1 = w1.values.std(axis=0).mean()
    spread2 = w2.values.std(axis=0).mean()
    assert spread2 < spread1


def test_pmt_with_gpdtw1d(rng, tmp_path):
    hind = make_collection(rng, n_models=3, n_reals=(2,), n_months=14)
    fore = make_collection(rng, n_models=3, n_reals=(2,), n_months=14)
    pmt = bet.PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=lambda: bet.GPDTW1D(dtype=np.float64),
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="gp",
        save_dir=None,
    )
    df = pmt.run(n_optim_nits=5)
    assert len(df) == 3
    assert np.isfinite(df.iloc[:, 1:].to_numpy(dtype=float)).all()


def test_loglik_joint_option(rng):
    """joint=True scores each obs trajectory under the full MVN posterior:
    one weight per model (constant over points), still summing to 1."""
    import scipy.stats

    from test_data import make_da
    from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
    from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D

    n_months = 18
    da_obs = make_da(rng, n_reals=4, n_months=n_months)
    obs = ProcessModel(da_obs, "obs")
    models = [
        ProcessModel(make_da(rng, n_reals=3, n_months=n_months), f"m{i}")
        for i in range(3)
    ]
    mc = ModelCollection(models)
    mc.fit(GPDTW1D(dtype=np.float64), n_optim_nits=5, dba_iterations=2)

    w = bet.LogLikelihoodWeight()(mc, obs, joint=True)
    vals = np.asarray(w.values)
    np.testing.assert_allclose(vals.sum(axis=0), 1.0, rtol=1e-8)
    # Constant over points (one weight per model).
    assert np.allclose(vals, vals[:, :1])

    # Golden: softmax of the mean joint MVN log-density (scipy oracle).
    lls = []
    for pm in mc:
        g = pm.distribution.gaussian
        mvn = scipy.stats.multivariate_normal(
            np.asarray(g.mean), np.asarray(g.cov), allow_singular=True
        )
        lls.append(np.mean(mvn.logpdf(da_obs.values)))
    want = np.exp(lls - np.max(lls))
    want = want / want.sum()
    np.testing.assert_allclose(vals[:, 0], want, rtol=1e-5)


@pytest.mark.parametrize("weight_cls", ["CRPSWeight", "LogLikelihoodWeight"])
def test_account_obs_uncertainty(rng, weight_cls):
    """Error-in-observations scoring: the scorer sees var + var_obs.
    A sharp model inside observational spread stops being over-penalised."""
    from test_data import make_da
    from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
    from bayesian_ensembling_tpu.models.mean_field import MeanField

    n_months = 24
    time = (np.datetime64("2000-01", "M") + np.arange(n_months)).astype("datetime64[ns]")
    from bayesian_ensembling_tpu.coords import DimArray

    # obs: wide ensemble centred at 0
    obs_vals = 0.8 * rng.normal(size=(30, n_months))
    obs = ProcessModel(DimArray(obs_vals, ("realisation", "time"), {"time": time}), "obs")
    # model A: sharp, centred at obs mean; model B: broad, offset
    a = ProcessModel(DimArray(0.05 * rng.normal(size=(6, n_months)),
                              ("realisation", "time"), {"time": time}), "sharp")
    b = ProcessModel(DimArray(1.5 + 0.8 * rng.normal(size=(6, n_months)),
                              ("realisation", "time"), {"time": time}), "offset")
    mc = ModelCollection([a, b])
    mc.fit(MeanField(dtype=np.float64))

    cls = getattr(bet, weight_cls)
    w_plain = np.asarray(cls()(mc, obs).values)
    w_acct = np.asarray(cls()(mc, obs, account_obs_uncertainty=True).values)
    np.testing.assert_allclose(w_acct.sum(axis=0), 1.0, rtol=1e-8)
    assert not np.allclose(w_plain, w_acct)
    # The sharp centred model's mean weight must improve once obs spread is
    # credited to the forecast distribution.
    assert w_acct[0].mean() > w_plain[0].mean() - 1e-12
    assert w_acct[0].mean() > w_acct[1].mean()
