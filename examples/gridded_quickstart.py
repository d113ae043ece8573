"""Gridded quickstart: per-cell emulation, weighting, and barycentre.

The spatiotemporal capability (reference ``GPDTW3D``) end-to-end on a small
synthetic lat/lon grid — every (model, cell) pair gets its own DBA +
heteroskedastic GP, cells weighted per point against gridded observations,
combined with the per-cell W2 barycentre.  Runs everywhere in under a
minute; on TPU the same code scales to 12,960 cells in ~10 s
(benchmarks/gridded_bench.py).

    python examples/gridded_quickstart.py

For multi-chip execution, the same pipeline shards over a
``Mesh(('model', 'cells'))`` via
``parallel.gridded.make_sharded_gridded_step`` with psum couplings at the
weight normalisation and barycentre sums only.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bayesian_ensembling_tpu as bet
from bayesian_ensembling_tpu.coords import DimArray
from bayesian_ensembling_tpu.pipeline import run_gridded_scenario


def synthetic_gridded_model(rng, name, n_reals, lat, lon, n_years=30, warm=1.0):
    time = (np.datetime64("1991", "Y") + np.arange(n_years)).astype("datetime64[ns]")
    lats = np.linspace(-60, 60, lat)
    lons = np.linspace(0, 330, lon)
    trend = warm * np.linspace(0, 1, n_years)[None, :, None, None]
    pattern = np.cos(np.deg2rad(lats))[None, None, :, None]
    vals = (
        trend * pattern
        + 0.2 * rng.normal(size=(n_reals, n_years, lat, lon))
    )
    da = DimArray(
        vals,
        ("realisation", "time", "latitude", "longitude"),
        {"time": time, "latitude": lats, "longitude": lons},
        name="tas",
    )
    return bet.ProcessModel(da, name)


def main():
    rng = np.random.default_rng(0)
    lat, lon = 4, 6
    models = [
        synthetic_gridded_model(rng, f"model{i}", n_reals=3, lat=lat, lon=lon, warm=w)
        for i, w in enumerate((0.8, 1.0, 1.2))
    ]
    mc = bet.ModelCollection(models)
    obs = synthetic_gridded_model(rng, "obs", n_reals=5, lat=lat, lon=lon, warm=1.0)

    weights, bary = run_gridded_scenario(
        mc, obs, n_optim_nits=100, dba_iterations=3
    )
    print("weights dims:", weights.dims, weights.shape)
    mean = np.asarray(bary.gaussian.mean).reshape(-1, lat, lon)
    print("barycentre mean, final year (lat x lon):")
    print(np.array2string(mean[-1], precision=2))
    assert np.isfinite(mean).all()
    # Model 1 (warm=1.0) matches the pseudo-obs best -> largest mean weight.
    w_by_model = np.asarray(weights.values).reshape(len(mc), -1).mean(axis=1)
    print("mean weight per model:", np.round(w_by_model, 3))


if __name__ == "__main__":
    main()
