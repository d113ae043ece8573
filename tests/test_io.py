"""IO tests: CF time decoding, netCDF reading of the bundled GMST files."""

import os

import numpy as np
import pytest

from bayesian_ensembling_tpu.io import netcdf, timeutils

REF_DATA = "/root/reference/experiments/data"
OBS = os.path.join(REF_DATA, "obs/gmst/HadCRUT.5.0.1.0.analysis.anomalies_gmst.nc")

needs_data = pytest.mark.skipif(not os.path.exists(OBS), reason="reference data absent")


def test_decode_cf_time_days():
    t = timeutils.decode_cf_time(np.array([0.0, 31.0]), "days since 1850-01-01")
    assert t[0] == np.datetime64("1850-01-01", "ns")
    assert t[1] == np.datetime64("1850-02-01", "ns")


def test_decode_cf_time_hours_with_clock():
    t = timeutils.decode_cf_time(np.array([0, 708]), "hours since 2015-01-16 12:00:00")
    assert t[0] == np.datetime64("2015-01-16T12:00:00", "ns")
    assert t[1] == np.datetime64("2015-02-15T00:00:00", "ns")


def test_months_years():
    t = np.array(["2000-01-15", "2000-12-31", "2001-06-01"], dtype="datetime64[ns]")
    np.testing.assert_array_equal(timeutils.months_of(t), [1, 12, 6])
    np.testing.assert_array_equal(timeutils.years_of(t), [2000, 2000, 2001])


def test_monthly_climatology_and_anomaly(rng):
    n_months = 240
    time = (np.datetime64("1961-01", "M") + np.arange(n_months)).astype("datetime64[ns]")
    seasonal = np.sin(2 * np.pi * (np.arange(n_months) % 12) / 12)
    data = seasonal[None, :] + rng.normal(scale=0.01, size=(5, n_months))
    clim = timeutils.monthly_climatology(data, time, ("1961-01-01", "1980-12-31"))
    assert clim.shape == (12,)
    np.testing.assert_allclose(clim, seasonal[:12], atol=0.02)
    anom = timeutils.apply_climatology(data, time, clim)
    assert abs(anom.mean()) < 0.02


def test_annual_mean(rng):
    time = (np.datetime64("2000-01", "M") + np.arange(24)).astype("datetime64[ns]")
    data = rng.normal(size=(2, 24))
    out, new_time = timeutils.annual_mean(data, time)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[:, 0], data[:, :12].mean(1))
    assert timeutils.years_of(new_time).tolist() == [2000, 2001]


@needs_data
def test_open_obs_file():
    da = netcdf.open_dataarray(OBS)
    assert da.dims == ("realisation", "time")
    assert da.shape == (200, 1980)
    assert da.time[0] == np.datetime64("1850-01-16T12:00:00", "ns")
    assert not np.isnan(da.values).all()


@needs_data
def test_open_model_file():
    path = os.path.join(REF_DATA, "gmst/historical/CCCma_CanESM5-p1_historical_gmst.nc")
    da = netcdf.open_dataarray(path, name="CanESM5-p1")
    assert da.dims == ("realisation", "time")
    assert da.shape == (25, 1980)
    assert da.name == "CanESM5-p1"
    years = timeutils.years_of(da.time)
    assert years[0] == 1850 and years[-1] == 2014


def test_resample_mean_monthly_quarterly_annual_vs_pandas(rng):
    """resample_mean matches pandas resample().mean() for M/Q/Y (reference
    calculate_anomaly passes arbitrary pandas freqs, data.py:255-257)."""
    import pandas as pd

    n = 40  # deliberately not a multiple of 12: ragged final periods
    months = np.datetime64("1961-01", "M") + np.arange(n)
    time = months.astype("datetime64[ns]") + np.timedelta64(14, "D")
    data = rng.normal(size=(3, n))
    for freq, pfreq in [("M", "ME"), ("Q", "QE"), ("Y", "YE"), ("ME", "ME"), ("A", "YE")]:
        out, new_time = timeutils.resample_mean(data, time, freq)
        df = pd.DataFrame(data.T, index=pd.DatetimeIndex(time))
        want = df.resample(pfreq).mean()
        np.testing.assert_allclose(out, want.values.T, rtol=1e-12)
        np.testing.assert_array_equal(new_time, want.index.values.astype("datetime64[ns]"))


def test_resample_mean_unsupported_freq():
    time = np.array(["2000-01-31"], dtype="datetime64[ns]")
    with pytest.raises(NotImplementedError):
        timeutils.resample_mean(np.zeros((1, 1)), time, "W")


def test_resample_mean_start_anchored_labels(rng):
    """YS/AS/MS/QS label period STARTS (pandas start-anchored spellings);
    values are identical to the end-anchored forms."""
    time = (np.datetime64("2000-01", "M") + np.arange(24)).astype("datetime64[ns]")
    data = rng.normal(size=(2, 24))
    end_vals, end_t = timeutils.resample_mean(data, time, "Y")
    start_vals, start_t = timeutils.resample_mean(data, time, "YS")
    np.testing.assert_array_equal(end_vals, start_vals)
    assert str(end_t[0])[:10] == "2000-12-31"
    assert str(start_t[0])[:10] == "2000-01-01"
    _, ms_t = timeutils.resample_mean(data, time, "MS")
    assert str(ms_t[1])[:10] == "2000-02-01"
    _, qs_t = timeutils.resample_mean(data, time, "QS")
    assert str(qs_t[1])[:10] == "2000-04-01"


def test_netcdf_subhour_time_roundtrip(rng, tmp_path):
    """Sub-hour time stamps must round-trip exactly (the old writer floored
    offsets to whole hours)."""
    from bayesian_ensembling_tpu.coords import DimArray
    from bayesian_ensembling_tpu.io import netcdf

    time = np.array(
        ["2000-01-01T00:30", "2000-01-01T01:45", "2000-01-01T03:10"],
        dtype="datetime64[ns]",
    )
    da = DimArray(rng.normal(size=(2, 3)), ("realisation", "time"), {"time": time}, name="tas")
    p = str(tmp_path / "subhour.nc")
    netcdf.save_dataarray(p, da)
    back = netcdf.open_dataarray(p)
    np.testing.assert_array_equal(back.time, time)
    np.testing.assert_allclose(back.values, da.values)


def test_climatology_and_resample_skip_nan(rng):
    """NaN cells reduce the sample count (xarray semantics) instead of
    poisoning the whole month/year."""
    n = 24
    time = (np.datetime64("1961-01", "M") + np.arange(n)).astype("datetime64[ns]")
    data = np.ones((2, n))
    data[0, 0] = np.nan  # one missing January sample
    clim = timeutils.monthly_climatology(data, time, ("1961-01-01", "1962-12-31"))
    assert np.isfinite(clim).all() and clim[0] == 1.0
    out, _ = timeutils.resample_mean(data, time, "Y")
    assert np.isfinite(out).all()


def test_netcdf_rejects_nongregorian_calendar(tmp_path):
    import h5py

    from bayesian_ensembling_tpu.io import netcdf

    p = str(tmp_path / "cal360.nc")
    with h5py.File(p, "w") as f:
        v = f.create_dataset("tas", data=np.zeros((1, 3)))
        t = f.create_dataset("time", data=np.arange(3) * 30.0)
        t.attrs["units"] = np.bytes_("days since 1850-01-01")
        t.attrs["calendar"] = np.bytes_("360_day")
        r = f.create_dataset("realisation", data=np.arange(1))
        t.make_scale("time")
        r.make_scale("realisation")
        v.dims[0].attach_scale(r)
        v.dims[1].attach_scale(t)
    with pytest.raises(NotImplementedError, match="360_day"):
        netcdf.open_dataarray(p)


def test_netcdf_unpacks_scaled_integers(tmp_path):
    """CF packed data (scale_factor/add_offset on integer storage) must be
    unpacked, with integer fill sentinels masked to NaN."""
    import h5py

    from bayesian_ensembling_tpu.io import netcdf

    p = str(tmp_path / "packed.nc")
    raw = np.array([[100, 200, -32767]], dtype=np.int16)
    with h5py.File(p, "w") as f:
        v = f.create_dataset("tas", data=raw)
        v.attrs["scale_factor"] = np.float64(0.01)
        v.attrs["add_offset"] = np.float64(273.15)
        v.attrs["_FillValue"] = np.int16(-32767)
        t = f.create_dataset("time", data=np.arange(3, dtype=np.float64))
        t.attrs["units"] = np.bytes_("days since 2000-01-01")
        r = f.create_dataset("realisation", data=np.arange(1))
        t.make_scale("time")
        r.make_scale("realisation")
        v.dims[0].attach_scale(r)
        v.dims[1].attach_scale(t)
    da = netcdf.open_dataarray(p)
    np.testing.assert_allclose(da.values[0, :2], [274.15, 275.15])
    assert np.isnan(da.values[0, 2])


def test_decode_cf_time_wide_epoch():
    """Epochs OUTSIDE the datetime64[ns] range must decode correctly when
    the decoded instants are inside it (np.datetime64(..., 'ns') silently
    wrapped 'days since 0001-01-01' to 1754 before)."""
    days = 365.2425 * 2014 + 16  # ~mid-January 2015
    t = timeutils.decode_cf_time(np.array([days]), "days since 0001-01-01")
    assert str(t[0]).startswith("2015-01-1")


def test_decode_cf_time_out_of_range_raises():
    with pytest.raises(ValueError, match="outside"):
        timeutils.decode_cf_time(np.array([0.0]), "days since 0001-01-01")
    # int64-ns overflow used to become NaT with only a RuntimeWarning
    with pytest.raises(ValueError):
        timeutils.decode_cf_time(np.array([1e18]), "days since 1850-01-01")


def test_climatology_includes_intra_day_end_stamps():
    """A date-only window end includes the WHOLE end day (xarray slice
    semantics): end-of-period stamps like 1990-12-31T12:00 used to be
    dropped from the final month."""
    # One stamp per month of 1990, each at midday on the month's LAST day.
    months = np.datetime64("1990-01", "M") + np.arange(12)
    last_day = (months + 1).astype("datetime64[D]") - np.timedelta64(1, "D")
    time = last_day.astype("datetime64[ns]") + np.timedelta64(12, "h")
    data = np.arange(1.0, 13.0)[None, :]  # (realisation, time)
    out = timeutils.monthly_climatology(
        data, time, window=("1961-01-01", "1990-12-31")
    )
    np.testing.assert_array_equal(out, np.arange(1.0, 13.0))


def test_climatology_month_resolution_window_end():
    """A month-resolution window end ('1990-12') covers the WHOLE month
    (xarray label-slice semantics) — mid-month CMIP stamps in the final
    month used to be silently dropped."""
    months = np.datetime64("1990-01", "M") + np.arange(12)
    time = months.astype("datetime64[D]").astype("datetime64[ns]") + np.timedelta64(
        15, "D"
    )
    data = np.arange(1.0, 13.0)[None, :]
    out = timeutils.monthly_climatology(data, time, window=("1990-01", "1990-12"))
    np.testing.assert_array_equal(out, np.arange(1.0, 13.0))


def test_netcdf_fractional_second_epoch_roundtrip(rng, tmp_path):
    """A first stamp with fractional seconds must round-trip exactly (the
    units string used to truncate the epoch to whole seconds, silently
    shifting every re-opened stamp)."""
    from bayesian_ensembling_tpu.coords import DimArray
    from bayesian_ensembling_tpu.io import netcdf

    base = np.datetime64("2000-01-01T00:00:00.500", "ns")
    time = base + np.arange(3) * np.timedelta64(1, "h")
    da = DimArray(
        rng.normal(size=(2, 3)), ("realisation", "time"), {"time": time}, name="tas"
    )
    p = str(tmp_path / "frac.nc")
    netcdf.save_dataarray(p, da)
    back = netcdf.open_dataarray(p)
    np.testing.assert_array_equal(back.time, time)
