"""PerfectModelTest harness + metrics tests."""

import os

import numpy as np
import pytest
import scipy.stats

import bayesian_ensembling_tpu as bet
from bayesian_ensembling_tpu import metrics
from bayesian_ensembling_tpu.data import ModelCollection, Posterior, ProcessModel
from bayesian_ensembling_tpu.models.mean_field import MeanField
from bayesian_ensembling_tpu.ops.distributions import DiagGaussian
from bayesian_ensembling_tpu.validation import PerfectModelTest, load_model_collection

from test_data import make_collection, make_da

import jax.numpy as jnp


def test_nll_matches_scipy(rng):
    n = 10
    mean = rng.normal(size=n)
    var = rng.uniform(0.5, 1.5, n)
    obs = rng.normal(size=(4, n))
    tmpl_pm = ProcessModel(make_da(rng, n_reals=2, n_months=n), "t")
    post = Posterior(
        gaussian=DiagGaussian(mean=jnp.asarray(mean), var=jnp.asarray(var)),
        template=tmpl_pm.blank_template(),
    )
    got = metrics.nll(post, obs)
    want = -scipy.stats.norm.logpdf(obs, mean, np.sqrt(var)).mean()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_crps_matches_quadrature(rng):
    """metrics.crps == the defining integral CRPS = ∫ (F(x) - 1{x>=y})^2 dx,
    evaluated by scipy quadrature per (realisation, point)."""
    import scipy.integrate

    n = 4
    mean = rng.normal(size=n)
    var = rng.uniform(0.5, 1.5, n)
    obs = rng.normal(size=(3, n))
    tmpl_pm = ProcessModel(make_da(rng, n_reals=2, n_months=n), "t")
    post = Posterior(
        gaussian=DiagGaussian(mean=jnp.asarray(mean), var=jnp.asarray(var)),
        template=tmpl_pm.blank_template(),
    )
    got = metrics.crps(post, obs)

    def crps_1d(y, mu, sd):
        f = lambda x: (scipy.stats.norm.cdf(x, mu, sd) - (x >= y)) ** 2
        lo, hi = mu - 12 * sd, mu + 12 * sd
        return (
            scipy.integrate.quad(f, lo, y, limit=200)[0]
            + scipy.integrate.quad(f, y, hi, limit=200)[0]
        )

    want = np.mean(
        [
            crps_1d(obs[r, i], mean[i], np.sqrt(var[i]))
            for r in range(obs.shape[0])
            for i in range(n)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rmse_zero_for_perfect_mean(rng):
    n = 8
    obs = np.tile(rng.normal(size=n), (3, 1))
    tmpl_pm = ProcessModel(make_da(rng, n_reals=2, n_months=n), "t")
    post = Posterior(
        gaussian=DiagGaussian(mean=jnp.asarray(obs[0]), var=jnp.ones(n)),
        template=tmpl_pm.blank_template(),
    )
    assert metrics.rmse(post, obs) == 0.0


def test_w2_between_posteriors_identity(rng):
    tmpl_pm = ProcessModel(make_da(rng, n_reals=2, n_months=6), "t")
    g = DiagGaussian(mean=jnp.arange(6.0), var=jnp.ones(6))
    p = Posterior(gaussian=g, template=tmpl_pm.blank_template())
    assert abs(metrics.w2_between_posteriors(p, p)) < 1e-8


def test_pmt_runs_and_scores(rng, tmp_path):
    n_months = 16
    hind = make_collection(rng, n_models=3, n_reals=(3,), n_months=n_months)
    fore = make_collection(rng, n_models=3, n_reals=(3,), n_months=n_months)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=lambda: MeanField(dtype=np.float64),
        weight_method=bet.LogLikelihoodWeight,
        ensemble_method=bet.Barycentre,
        ssp="testssp",
        save_dir=str(tmp_path / "pmt"),
    )
    df = pmt.run(n_optim_nits=0)
    assert len(df) == 3
    for col in df.columns[1:]:
        assert np.isfinite(df[col].to_numpy(dtype=float)).all()
    # Figures + CSV written.
    import glob, os

    assert glob.glob(str(tmp_path / "pmt/csvs/*.csv"))
    assert len(glob.glob(str(tmp_path / "pmt/figs/weights/*.png"))) == 3
    assert len(glob.glob(str(tmp_path / "pmt/figs/projs/*.png"))) == 3


def test_pmt_include_sim(rng, tmp_path):
    n_months = 12
    hind = make_collection(rng, n_models=3, n_reals=(2,), n_months=n_months)
    fore = make_collection(rng, n_models=3, n_reals=(2,), n_months=n_months)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=lambda: MeanField(dtype=np.float64),
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="s",
        include_sim=True,
        save_dir=None,
    )
    df = pmt.run(n_optim_nits=0)
    assert len(df) == 3


def test_pmt_leaves_source_collections_unfitted(rng):
    hind = make_collection(rng, n_models=2, n_reals=(2,), n_months=10)
    fore = make_collection(rng, n_models=2, n_reals=(2,), n_months=10)
    pmt = PerfectModelTest(
        hind, fore,
        emulate_method=lambda: MeanField(dtype=np.float64),
        weight_method=bet.UniformWeight,
        ensemble_method=bet.MultiModelMean,
        ssp="s",
    )
    pmt.run(n_optim_nits=0)
    # copy.copy isolation: originals keep no posterior.
    assert all(m.distribution is None for m in hind)


def test_prefit_checkpoint_roundtrip(rng, tmp_path):
    mc = make_collection(rng, n_models=2, n_months=10)
    mc.fit(MeanField(dtype=np.float64))
    path = str(tmp_path / "prefit.npz")
    mc.save(path)
    back = load_model_collection(path)
    assert all(m.distribution is not None for m in back)


def test_orbax_checkpoint_roundtrip(rng, tmp_path):
    """ModelCollection.save(backend="orbax") round-trips data, climatology
    and fitted posteriors exactly (ROADMAP: orbax backend)."""
    from test_data import make_collection
    from bayesian_ensembling_tpu.data import ModelCollection
    from bayesian_ensembling_tpu.models.mean_field import MeanField

    mc = make_collection(rng, n_models=2, n_reals=(2, 3), n_months=24)
    mc = ModelCollection(
        [
            m.calculate_anomaly(climatology_dates=("2000-01-01", "2001-12-31"))
            for m in mc
        ]
    )
    mc.fit(MeanField(dtype=np.float64))
    path = str(tmp_path / "ckpt_orbax")
    mc.save(path, backend="orbax")
    back = ModelCollection.load(path)
    assert back.model_names == mc.model_names
    for a, b in zip(mc, back):
        np.testing.assert_array_equal(a.data.values, b.data.values)
        np.testing.assert_array_equal(a.time, b.time)
        np.testing.assert_array_equal(a.climatology, b.climatology)
        np.testing.assert_allclose(
            np.asarray(a.distribution.gaussian.mean),
            np.asarray(b.distribution.gaussian.mean),
        )
        np.testing.assert_allclose(
            np.asarray(a.distribution.gaussian.variance),
            np.asarray(b.distribution.gaussian.variance),
        )


def _prefit(rng, n_models=4, n_months=14):
    from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D

    hind = make_collection(rng, n_models=n_models, n_reals=(2, 3, 4), n_months=n_months)
    fore = make_collection(rng, n_models=n_models, n_reals=(2, 3, 4), n_months=n_months)
    hind.fit(GPDTW1D(dtype=np.float64), n_optim_nits=5, dba_iterations=2)
    fore.fit(GPDTW1D(dtype=np.float64), n_optim_nits=5, dba_iterations=2)
    return hind, fore


def test_batched_pmt_matches_loop(rng):
    """All-folds-in-one-program PMT == the serial loop path, every campaign
    weighter, ragged realisation counts, full-covariance prefit posteriors
    (exercises the constant-vector log-likelihood branch)."""
    import pytest as _pt

    hind, fore = _prefit(rng)
    for weight_cls in (
        bet.CRPSWeight,
        bet.LogLikelihoodWeight,
        bet.KSDWeight,
        bet.InverseSquareWeight,
        bet.UniformWeight,
    ):
        pmt = PerfectModelTest(
            hindcast_models=hind,
            forecast_models=fore,
            emulate_method=None,
            weight_method=weight_cls,
            ensemble_method=bet.Barycentre,
            ssp="testssp",
        )
        want = pmt.run(use_prefit_models=True)
        got = pmt.run_batched()
        assert list(got.columns) == list(want.columns)
        np.testing.assert_allclose(
            got.iloc[:, 1:].to_numpy(dtype=float),
            want.iloc[:, 1:].to_numpy(dtype=float),
            rtol=1e-5,
            atol=1e-8,
            err_msg=f"batched != loop for {weight_cls.__name__}",
        )


def test_batched_pmt_compat_fixed_point(rng):
    hind, fore = _prefit(rng, n_models=3, n_months=10)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=None,
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="testssp",
        scheme_kwargs={"compat_fixed_point": True},
    )
    want = pmt.run(use_prefit_models=True)
    got = pmt.run_batched()
    np.testing.assert_allclose(
        got.iloc[:, 1:].to_numpy(dtype=float),
        want.iloc[:, 1:].to_numpy(dtype=float),
        rtol=1e-5,
        atol=1e-8,
    )


def test_batched_pmt_include_sim_matches_loop(rng):
    hind, fore = _prefit(rng, n_models=3, n_months=10)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=None,
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="testssp",
        include_sim=True,
    )
    want = pmt.run(use_prefit_models=True)
    got = pmt.run_batched()
    np.testing.assert_allclose(
        got.iloc[:, 1:].to_numpy(dtype=float),
        want.iloc[:, 1:].to_numpy(dtype=float),
        rtol=1e-5,
        atol=1e-8,
    )


def test_batched_pmt_mixed_posterior_types_matches_loop(rng):
    """A collection mixing FullCov (GPDTW1D) and Diag (MeanField) posteriors
    must score each model with ITS posterior's log-likelihood branch, like
    the library path does per model."""
    from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D

    hind = make_collection(rng, n_models=3, n_reals=(2, 3), n_months=10)
    fore = make_collection(rng, n_models=3, n_reals=(2, 3), n_months=10)
    hind.fit(GPDTW1D(dtype=np.float64), n_optim_nits=3, dba_iterations=1)
    fore.fit(GPDTW1D(dtype=np.float64), n_optim_nits=3, dba_iterations=1)
    # Replace one model's posterior with a Diag fit (mixed collection).
    hind[1].distribution = MeanField(dtype=np.float64).fit(hind[1], n_optim_nits=0)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=None,
        weight_method=bet.LogLikelihoodWeight,
        ensemble_method=bet.Barycentre,
        ssp="testssp",
    )
    want = pmt.run(use_prefit_models=True)
    got = pmt.run_batched()
    np.testing.assert_allclose(
        got.iloc[:, 1:].to_numpy(dtype=float),
        want.iloc[:, 1:].to_numpy(dtype=float),
        rtol=1e-5,
        atol=1e-8,
    )


def test_run_batched_guards(rng):
    import pytest as _pt

    hind = make_collection(rng, n_models=2, n_reals=(2,), n_months=8)
    fore = make_collection(rng, n_models=2, n_reals=(2,), n_months=8)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=None,
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.WeightedModelMean,
        ssp="testssp",
    )
    with _pt.raises(ValueError, match="Barycentre"):
        pmt.run_batched()
    pmt2 = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=None,
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="testssp",
    )
    with _pt.raises(ValueError, match="PREFIT"):
        pmt2.run_batched()


def test_batched_pmt_mixture_sigma_matches_loop(rng):
    """sigma_mode='mixture' (VERDICT r2 item 2): batched == loop, and the
    mixture sigma is never smaller than the W2 barycentre sigma (it adds
    the inter-model spread term)."""
    hind, fore = _prefit(rng, n_models=3, n_months=10)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=None,
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="testssp",
        scheme_kwargs={"sigma_mode": "mixture"},
    )
    want = pmt.run(use_prefit_models=True)
    got = pmt.run_batched()
    np.testing.assert_allclose(
        got.iloc[:, 1:].to_numpy(dtype=float),
        want.iloc[:, 1:].to_numpy(dtype=float),
        rtol=1e-5,
        atol=1e-8,
    )


def test_batched_pmt_pad_shape_matches_unpadded(rng):
    """Shape-bucketed batched PMT (pad_shape): padded program == unpadded
    for every campaign weighter, plus the include-sim and mixture-sigma
    variants — the padding masks must make padded models/realisations/folds
    invisible to the real results."""
    import pytest

    from bayesian_ensembling_tpu.validation import batched_pmt

    hind, fore = _prefit(rng, n_models=3, n_months=10)
    for kind in ("crps", "loglik", "ksd", "inverse_square", "uniform"):
        want = batched_pmt(hind, fore, kind)
        got = batched_pmt(hind, fore, kind, pad_shape=(6, 7))
        assert got.shape == want.shape
        np.testing.assert_allclose(
            got, want, rtol=1e-6, atol=1e-9, err_msg=f"pad_shape != plain for {kind}"
        )
    for kw in (
        {"include_sim": True},
        {"sigma_mode": "mixture"},
        {"compat_fixed_point": True},
    ):
        want = batched_pmt(hind, fore, "crps", **kw)
        got = batched_pmt(hind, fore, "crps", pad_shape=(5, 6), **kw)
        np.testing.assert_allclose(
            got, want, rtol=1e-6, atol=1e-9, err_msg=f"pad_shape != plain for {kw}"
        )
    with pytest.raises(ValueError, match="pad_shape"):
        batched_pmt(hind, fore, "crps", pad_shape=(2, 6))


def test_run_batched_figures(rng, tmp_path):
    """run_batched(figures=True) draws the reference's per-fold weight and
    projection figures (utils.py:121-131,163-179) from the batched
    program's own outputs."""
    hind, fore = _prefit(rng, n_models=3, n_months=10)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=None,
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="testssp",
        save_dir=str(tmp_path),
    )
    pmt.run_batched(figures=True)
    weights_dir = tmp_path / "figs" / "weights"
    projs_dir = tmp_path / "figs" / "projs"
    assert len(list(weights_dir.glob("*.png"))) == len(hind)
    assert len(list(projs_dir.glob("*.png"))) == len(hind)


def test_campaign_cli_bucketed(rng, tmp_path, capsys, monkeypatch):
    """The campaign CLI's --batched path: prefit npz collections for two
    'scenarios' with different model counts run through one shape bucket and
    produce CSVs for both."""
    import runpy
    import sys

    prefit = tmp_path / "prefit"
    prefit.mkdir()
    for ssp, n_models in (("sspa", 3), ("sspb", 4)):
        hind, fore = _prefit(rng, n_models=n_models, n_months=10)
        hind.save(str(prefit / f"hist_{ssp}.npz"))
        fore.save(str(prefit / f"{ssp}.npz"))

    path = os.path.join(
        os.path.dirname(__file__), "..", "experiments", "perfect_model_tests.py"
    )
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "perfect_model_tests",
            "--batched",
            "--prefit-dir", str(prefit),
            "--ssps", "sspa,sspb",
            "--weights", "CRPSWeight,UniformWeight",
            "--out-dir", str(tmp_path / "out"),
        ],
    )
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "shape bucket: pad_m=4" in out
    for ssp in ("sspa", "sspb"):
        csvs = list((tmp_path / "out" / ssp / "csvs").glob("*.csv"))
        assert len(csvs) == 2, (ssp, csvs)


def test_batched_pmt_single_model_raises(rng):
    """One model has no leave-one-out folds: loud error, not NaN metrics."""
    from bayesian_ensembling_tpu.validation import batched_pmt

    hind, fore = _prefit(rng, n_models=1, n_months=8)
    with pytest.raises(ValueError, match="at least 2 models"):
        batched_pmt(hind, fore, "crps")


def test_campaign_cli_sigma_mode_conflict(monkeypatch):
    """--compat-fixed-point with a conflicting explicit --sigma-mode must
    error at parse time (silently computing compat numbers under a mixture
    label mislabels the campaign CSVs)."""
    import runpy
    import sys

    import pytest

    path = os.path.join(
        os.path.dirname(__file__), "..", "experiments", "perfect_model_tests.py"
    )
    monkeypatch.setattr(
        sys,
        "argv",
        ["perfect_model_tests", "--sigma-mode", "mixture", "--compat-fixed-point"],
    )
    with pytest.raises(SystemExit) as exc:
        runpy.run_path(path, run_name="__main__")
    assert exc.value.code == 2  # argparse usage error


def test_batched_pmt_mixed_types_include_sim_matches_loop(rng):
    """include_sim with a MIXED FullCov/Diag collection: the loop path's
    ModelSimilarityWeight picks full-cov vs diag W2 per REDUCED collection
    (the fold excluding the Diag member is all-FullCov), so the batched
    path must dispatch per fold, not per collection."""
    from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D

    hind = make_collection(rng, n_models=3, n_reals=(2, 3), n_months=10)
    fore = make_collection(rng, n_models=3, n_reals=(2, 3), n_months=10)
    hind.fit(GPDTW1D(dtype=np.float64), n_optim_nits=3, dba_iterations=1)
    fore.fit(GPDTW1D(dtype=np.float64), n_optim_nits=3, dba_iterations=1)
    hind[1].distribution = MeanField(dtype=np.float64).fit(hind[1], n_optim_nits=0)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=None,
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="testssp",
        include_sim=True,
    )
    want = pmt.run(use_prefit_models=True)
    got = pmt.run_batched()
    np.testing.assert_allclose(
        got.iloc[:, 1:].to_numpy(dtype=float),
        want.iloc[:, 1:].to_numpy(dtype=float),
        rtol=1e-5,
        atol=1e-8,
    )


def test_batched_pmt_include_sim_two_models_raises(rng):
    """2 models + include_sim: the loop fails loudly inside the similarity
    weighter; the batched path must refuse too instead of emitting NaNs."""
    hind, fore = _prefit(rng, n_models=2, n_months=8)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=None,
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="testssp",
        include_sim=True,
    )
    with pytest.raises(ValueError, match="at least 3 models"):
        pmt.run_batched()


def test_run_batched_figure_and_callable_guards(rng):
    """figures=True needs save_dir; non-class ensemble_method gets the
    guidance ValueError (not a TypeError from issubclass)."""
    hind, fore = _prefit(rng, n_models=3, n_months=8)
    pmt = PerfectModelTest(
        hindcast_models=hind,
        forecast_models=fore,
        emulate_method=None,
        weight_method=bet.CRPSWeight,
        ensemble_method=bet.Barycentre,
        ssp="testssp",
    )
    with pytest.raises(ValueError, match="save_dir"):
        pmt.run_batched(figures=True)
    pmt.ensemble_method = lambda: bet.Barycentre()
    with pytest.raises(ValueError, match="needs run"):
        pmt.run_batched()
