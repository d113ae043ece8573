"""GPDTW3D mode comparison: batched-exact per-cell GPs vs the SVGP.

The reference's GPDTW3D IS a sparse variational GP over spherical+time
features (models.py:233-424: 400 inducing points, minibatch 500); this
repo's default gridded mode instead fits every cell exactly (vmapped 1-D
pipeline), with the SVGP retained as the reference-family joint
approximation (`ops/svgp.py`).  This bench quantifies the trade on one
gridded workload: wall-clock and fit quality (RMSE of the posterior mean
against the noise-free generating signal) for both modes.

Usage: python benchmarks/svgp_bench.py [lat] [lon] [r] [t] [n_optim_nits]
           [n_inducing] [minibatch]

Reference-scale configuration (models.py:370-381: 400 inducing points,
minibatch 500, ~100k-point problem): ``svgp_bench.py 24 48 10 86 500 400 500``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def make_gridded(rng, r, t, la, lo):
    from bayesian_ensembling_tpu.coords import DimArray
    from bayesian_ensembling_tpu.data import ProcessModel

    time_c = (np.datetime64("2000-01", "M") + np.arange(t)).astype("datetime64[ns]")
    lat = np.linspace(-60, 60, la)
    lon = np.linspace(0, 330, lo)
    # Smooth spatiotemporal signal + noise: trend * spatial pattern.
    tt = np.linspace(0, 2, t)[None, :, None, None]
    pat = (
        1.0
        + 0.5 * np.sin(np.deg2rad(lat))[None, None, :, None]
        + 0.3 * np.cos(np.deg2rad(lon))[None, None, None, :]
    )
    signal = np.sin(3 * tt) * pat + 0.5 * tt * pat
    vals = signal + 0.3 * rng.normal(size=(r, t, la, lo))
    da = DimArray(
        vals.astype(np.float32),
        ("realisation", "time", "latitude", "longitude"),
        {"time": time_c, "latitude": lat, "longitude": lon},
        name="tas",
    )
    return ProcessModel(da, "gridded"), signal[0]  # (t, la, lo)


def main():
    import jax

    from bayesian_ensembling_tpu.models.gp_3d import GPDTW3D

    la = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    t = int(sys.argv[4]) if len(sys.argv) > 4 else 86
    n_iters = int(sys.argv[5]) if len(sys.argv) > 5 else 500
    n_inducing = int(sys.argv[6]) if len(sys.argv) > 6 else 256
    minibatch = int(sys.argv[7]) if len(sys.argv) > 7 else 512

    rng = np.random.default_rng(0)
    pm, signal = make_gridded(rng, r, t, la, lo)
    truth = signal.reshape(-1)
    print(
        f"devices: {jax.devices()}\n"
        f"workload: {la}x{lo} cells x {r} realisations x {t} steps, "
        f"{n_iters} iterations",
        file=sys.stderr,
    )

    results = {}
    for mode, kwargs in (
        ("batched", {}),
        # Reference defaults scaled to the workload (models.py:321-327:
        # 400 inducing / minibatch 500 for ~100k-point problems).
        ("svgp", {"n_inducing": n_inducing, "minibatch_size": minibatch}),
    ):
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore")
            model = GPDTW3D(mode=mode)
            t0 = time.perf_counter()
            post = model.fit(pm, n_optim_nits=n_iters, dba_iterations=5, **kwargs)
            mean = np.asarray(post.gaussian.mean)
            warm = time.perf_counter() - t0
            # second run = compiled steady state
            t0 = time.perf_counter()
            post = model.fit(pm, n_optim_nits=n_iters, dba_iterations=5, **kwargs)
            mean = np.asarray(post.gaussian.mean)
            elapsed = time.perf_counter() - t0
        rmse = float(np.sqrt(np.mean((mean - truth) ** 2)))
        results[mode] = {"seconds": round(elapsed, 3), "warmup": round(warm, 1),
                         "rmse_vs_signal": round(rmse, 4)}
        print(f"{mode}: {elapsed:.2f}s, rmse {rmse:.4f}", file=sys.stderr)

    print(json.dumps({
        "metric": f"gpdtw3d_modes_{la}x{lo}x{r}x{t}_{n_iters}iters",
        "unit": "s",
        **results,
    }))


if __name__ == "__main__":
    main()
