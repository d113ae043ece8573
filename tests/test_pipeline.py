"""End-to-end pipeline tests on the bundled reference data (CPU, tiny iters)."""

import os

import numpy as np
import pytest

from bayesian_ensembling_tpu import pipeline

def _has_data() -> bool:
    try:
        pipeline.default_data_dir()
        return True
    except FileNotFoundError:
        return False


needs_data = pytest.mark.skipif(not _has_data(), reason="reference data absent")


@needs_data
def test_load_observations():
    obs = pipeline.load_observations()
    assert obs.data.shape == (200, 165)
    from bayesian_ensembling_tpu.io import timeutils

    years = timeutils.years_of(obs.time)
    assert years[0] == 1850 and years[-1] == 2014


@needs_data
def test_load_scenario_alignment():
    hist, ssp = pipeline.load_scenario("ssp119")
    assert len(hist) == len(ssp)
    assert hist.model_names == ssp.model_names
    assert len(hist.time) == 165 and len(ssp.time) == 86
    # Anomalies: near-zero mean over the climatology window.
    for pm in hist:
        sel = pm.data.sel_time("1961-01-01", "1990-12-31")
        assert abs(sel.values.mean()) < 0.05


@needs_data
def test_run_scenario_end_to_end(rng):
    obs = pipeline.load_observations()
    hist, ssp = pipeline.load_scenario("ssp460")
    res = pipeline.run_scenario(
        hist, ssp, obs, "ssp460", n_optim_nits=20, dba_iterations=2
    )
    summ = pipeline.warming_summary(res)
    for year in (2050, 2100):
        mean, lo, hi = summ[year]
        assert lo < mean < hi
        assert -2.0 < mean < 10.0
    np.testing.assert_allclose(res.weights.values.sum(axis=0), 1.0, rtol=1e-5)


@needs_data
def test_run_scenario_refine_f64_publishes_f64_tail(rng):
    """refine_f64=True must survive the whole container pipeline: the
    posteriors AND the weighting/combination tail stay float64 (without
    the x64 tail context the jnp-based weighters would silently downcast
    the refined moments back to f32)."""
    obs = pipeline.load_observations()
    hist, ssp = pipeline.load_scenario("ssp460")
    kw = dict(n_optim_nits=20, dba_iterations=2)
    res32 = pipeline.run_scenario(hist, ssp, obs, "ssp460", **kw)
    res64 = pipeline.run_scenario(
        hist, ssp, obs, "ssp460", refine_f64=True, **kw
    )
    g32, g64 = res32.barycentre.gaussian, res64.barycentre.gaussian
    assert np.asarray(g64.mean).dtype == np.float64
    assert np.asarray(g64.variance).dtype == np.float64
    # Refined fitted posteriors are f64 on the collections too.
    assert np.asarray(ssp[0].distribution.gaussian.mean).dtype == np.float64
    # Precision upgrade, not an algorithm change.
    assert float(
        np.abs(np.asarray(g32.mean, np.float64) - np.asarray(g64.mean)).max()
    ) < 1e-3
    np.testing.assert_allclose(
        res64.weights.values.sum(axis=0), 1.0, rtol=1e-12
    )


@needs_data
def test_multi_scenario_step_matches_single(rng):
    """The merged multi-scenario program equals per-scenario steps."""
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.parallel.step import (
        ensemble_multi_scenario_step,
        ensemble_scenario_step,
        pad_models,
    )

    obs_pm = pipeline.load_observations()
    obs = jnp.asarray(obs_pm.data.values, dtype=jnp.float64)
    packed = []
    for ssp in ("ssp119", "ssp460"):
        hist, ssp_mc = pipeline.load_scenario(ssp)
        hb, hm = hist.padded_stack(r_target=29, dtype=np.float64)
        sb, sm = ssp_mc.padded_stack(r_target=29, dtype=np.float64)
        hb, hm, mmask = pad_models(hb, hm, 16)
        sb, sm, _ = pad_models(sb, sm, 16)
        packed.append((hb, hm, sb, sm, mmask))
    stacked = [jnp.asarray(np.stack([p[i] for p in packed])) for i in range(5)]
    multi = ensemble_multi_scenario_step(
        *stacked[:4], obs, stacked[4], n_optim_nits=5, dba_iterations=2
    )
    for i, p in enumerate(packed):
        single = ensemble_scenario_step(
            jnp.asarray(p[0]), jnp.asarray(p[1]), jnp.asarray(p[2]),
            jnp.asarray(p[3]), obs, jnp.asarray(p[4]),
            n_optim_nits=5, dba_iterations=2,
        )
        np.testing.assert_allclose(
            np.asarray(multi[0][i]), np.asarray(single[0]), rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(multi[2][i]), np.asarray(single[2]), rtol=1e-8
        )


def test_run_gridded_scenario_end_to_end(rng):
    """GPDTW3D + per-point weighting + barycentre over a synthetic grid."""
    import numpy as np

    from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
    from bayesian_ensembling_tpu.models.gp_3d import GPDTW3D
    from test_gp3d import make_gridded

    models = []
    for i in range(3):
        pm = make_gridded(rng, r=2, t=8, la=2, lo=3)
        models.append(ProcessModel(pm.data, f"m{i}"))
    mc = ModelCollection(models)
    obs = make_gridded(rng, r=4, t=8, la=2, lo=3)

    weights, bary = pipeline.run_gridded_scenario(
        mc, obs,
        emulator=GPDTW3D(dtype=np.float64),
        n_optim_nits=10, dba_iterations=2,
    )
    assert weights.dims == ("model", "time", "latitude", "longitude")
    np.testing.assert_allclose(weights.values.sum(axis=0), 1.0, rtol=1e-6)
    assert bary.mean.dims == ("time", "latitude", "longitude")
    assert np.isfinite(bary.mean.values).all()
    assert (bary.variance.values > 0).all()


@needs_data
def test_single_site_rbf_fit_on_hadcrut5():
    """BASELINE.json config 1: single-site exact-GP fit (RBF kernel) to the
    HadCRUT5 GMST series itself."""
    from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D

    obs = pipeline.load_observations()  # 200 realisations x 165 annual steps
    post = GPDTW1D(kernel="rbf", dtype=np.float64).fit(
        obs, n_optim_nits=20, dba_iterations=2
    )
    mean = np.asarray(post.gaussian.mean)
    assert mean.shape == (165,)
    assert np.isfinite(mean).all()
    # The fitted emulator mean must track the observed ensemble mean.
    obs_mean = obs.data.values.mean(axis=0)
    rmse = np.sqrt(np.mean((mean - obs_mean) ** 2))
    assert rmse < 0.1, rmse
    # Posterior variance positive and finite everywhere.
    var = np.asarray(post.gaussian.variance)
    assert (var > 0).all() and np.isfinite(var).all()


def test_load_native_monthly_resolution():
    """resample_freq=None keeps the native monthly resolution — the large-T
    configuration (T = 1980 hist / 1032 SSP) that runs the XLA blocked
    linalg path (benchmarks/monthly_bench.py drives it end-to-end)."""
    obs = pipeline.load_observations(resample_freq=None)
    assert obs.data.values.shape[1] == 1980
    hist, ssp = pipeline.load_scenario("ssp119", resample_freq=None)
    assert hist[0].data.values.shape[1] == 1980
    assert ssp[0].data.values.shape[1] == 1032
    # The reference's calendar-collocation hack (full_experiment_script.py:53)
    # must leave hist model time axes identical to the observations' — the
    # weighters' alignment check requires it at native monthly resolution.
    np.testing.assert_array_equal(hist.time, obs.data.time)
    # quarterly goes through the generic resampler (12 -> 4 labels/year)
    obs_q = pipeline.load_observations(resample_freq="Q")
    assert obs_q.data.values.shape[1] == 1980 // 3


def test_run_scenario_sigma_modes(rng):
    """sigma_mode plumbs through run_scenario: mixture widens the interval
    relative to the W2 closed form at identical means."""
    import numpy as np
    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.coords import DimArray
    from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
    from bayesian_ensembling_tpu.models.mean_field import MeanField

    t = 12
    time = (np.datetime64("2015-01", "Y") + np.arange(t)).astype("datetime64[ns]")

    vals_hist = [rng.normal(size=(3, t)) + i for i in range(3)]
    vals_ssp = [rng.normal(size=(3, t)) + i for i in range(3)]

    def mc(vals_list):
        models = []
        for i, vals in enumerate(vals_list):
            da = DimArray(vals, ("realisation", "time"), {"time": time})
            models.append(ProcessModel(da, f"m{i}"))
        return ModelCollection(models)

    obs_da = DimArray(rng.normal(size=(4, t)), ("realisation", "time"), {"time": time})
    obs = ProcessModel(obs_da, "obs")

    out = {}
    for mode in ("w2", "mixture"):
        res = pipeline.run_scenario(
            mc(vals_hist), mc(vals_ssp), obs, "test", emulator=MeanField(),
            n_optim_nits=3, sigma_mode=mode,
        )
        out[mode] = res.barycentre
    np.testing.assert_allclose(
        np.asarray(out["w2"].gaussian.mean),
        np.asarray(out["mixture"].gaussian.mean),
        rtol=1e-6,
    )
    assert np.all(
        np.asarray(out["mixture"].gaussian.variance)
        >= np.asarray(out["w2"].gaussian.variance) - 1e-12
    )
