"""L0 data-processing tests: netCDF writer round-trip, GMST creation,
single-location extraction (synthetic gridded files)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "data_download"))

from bayesian_ensembling_tpu.coords import DimArray
from bayesian_ensembling_tpu.io import netcdf

from create_gmst import area_weighted_mean, create_gmst_file
from extract_single_location import extract_location


def make_gridded_file(tmp_path, rng, r=2, t=6, la=5, lo=8):
    time = (np.datetime64("2000-01", "M") + np.arange(t)).astype("datetime64[ns]")
    lat = np.linspace(-80, 80, la)
    lon = np.linspace(0, 315, lo)
    vals = rng.normal(size=(r, t, la, lo))
    da = DimArray(
        vals,
        ("realisation", "time", "latitude", "longitude"),
        {"time": time, "latitude": lat, "longitude": lon, "realisation": np.arange(r)},
        name="tas",
    )
    path = str(tmp_path / "gridded.nc")
    netcdf.save_dataarray(path, da, var_name="tas")
    return path, da


def test_save_load_roundtrip(tmp_path, rng):
    path, da = make_gridded_file(tmp_path, rng)
    back = netcdf.open_dataarray(path)
    assert back.dims == da.dims
    np.testing.assert_allclose(back.values, da.values)
    np.testing.assert_array_equal(back.time, da.time)
    np.testing.assert_allclose(back.get_coord("latitude"), da.get_coord("latitude"))


def test_area_weighted_mean_constant_field(tmp_path, rng):
    _, da = make_gridded_file(tmp_path, rng)
    da.values[:] = 3.5
    g = area_weighted_mean(da)
    assert g.dims == ("realisation", "time")
    np.testing.assert_allclose(g.values, 3.5, rtol=1e-12)


def test_area_weighted_mean_weights(tmp_path, rng):
    # Field = f(latitude): mean must equal cos-weighted average of f.
    _, da = make_gridded_file(tmp_path, rng)
    lat = da.get_coord("latitude")
    f = lat**2
    da.values[:] = f[None, None, :, None]
    g = area_weighted_mean(da)
    w = np.cos(np.deg2rad(lat))
    want = (f * w).sum() / w.sum()
    np.testing.assert_allclose(g.values, want, rtol=1e-10)


def test_create_gmst_file(tmp_path, rng):
    path, da = make_gridded_file(tmp_path, rng)
    out = create_gmst_file(path, str(tmp_path))
    assert out.endswith("_gmst.nc")
    g = netcdf.open_dataarray(out)
    assert g.dims == ("realisation", "time")
    np.testing.assert_array_equal(g.time, da.time)


def test_extract_location(tmp_path, rng):
    _, da = make_gridded_file(tmp_path, rng)
    out = extract_location(da, 52.5, 0.0)
    assert out.dims == ("realisation", "time")
    lat = da.get_coord("latitude")
    i = int(np.argmin(np.abs(lat - 52.5)))
    np.testing.assert_allclose(out.values, da.values[:, :, i, 0])


def test_extract_location_wraps_longitude(tmp_path, rng):
    _, da = make_gridded_file(tmp_path, rng)
    # lon=-45 should pick the 315 column under 0-360 convention.
    out = extract_location(da, 0.0, -45.0)
    lat = da.get_coord("latitude")
    i = int(np.argmin(np.abs(lat)))
    np.testing.assert_allclose(out.values, da.values[:, :, i, -1])
