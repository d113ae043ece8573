"""Quickstart: the full ensembling pipeline on synthetic data.

Runs everywhere (CPU included) in seconds — swap the synthetic collection
for `pipeline.load_scenario(...)` to use the real CMIP6/HadCRUT5 GMST data.

    python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bayesian_ensembling_tpu as bet
from bayesian_ensembling_tpu.coords import DimArray


def synthetic_model(rng, name, n_reals, n_months=120, offset=0.0):
    time = (np.datetime64("1961-01", "M") + np.arange(n_months)).astype(
        "datetime64[ns]"
    )
    trend = np.linspace(0.0, 1.5, n_months)
    seasonal = 0.4 * np.sin(2 * np.pi * (np.arange(n_months) % 12) / 12)
    vals = trend + seasonal + offset + 0.15 * rng.normal(size=(n_reals, n_months))
    da = DimArray(vals, ("realisation", "time"), {"time": time}, name="tas")
    return bet.ProcessModel(da, name)


def main():
    rng = np.random.default_rng(0)

    # 1. Wrap simulation output; compute anomalies vs a monthly climatology.
    models = [
        synthetic_model(rng, f"model{i}", n_reals=3 + i, offset=0.1 * i)
        for i in range(5)
    ]
    collection = bet.ModelCollection(
        [m.calculate_anomaly(("1961-01-01", "1970-12-31"), resample_freq="Y") for m in models]
    )
    obs = synthetic_model(rng, "obs", n_reals=8).calculate_anomaly(
        ("1961-01-01", "1970-12-31"), resample_freq="Y"
    )

    # 2. Emulate every model (one batched program).
    collection.fit(bet.GPDTW1D(), n_optim_nits=200)

    # 3. Weight against observations.
    weights = bet.CRPSWeight()(collection, obs)
    print("weights (time-mean):")
    for name, w in zip(collection.model_names, weights.mean("time").values):
        print(f"  {name}: {w:.3f}")

    # 4. Combine with the Wasserstein-2 barycentre.  (Alternatives:
    #    sigma_mode="mixture" for the calibrated moment-matched variance —
    #    the mode that wins held-out NLL in the PMT campaign — or
    #    sigma_mode="compat" for the reference's fixed-point iteration.)
    posterior = bet.Barycentre()(collection, weights)
    mean = posterior.mean
    sd = posterior.stddev
    print(f"\nensemble mean at final year: {mean.values[-1]:.3f} "
          f"(+-2sd {mean.values[-1]-2*sd.values[-1]:.3f}"
          f"..{mean.values[-1]+2*sd.values[-1]:.3f})")

    # 5. Validate with metrics.
    print(f"NLL vs obs: {bet.metrics.nll(posterior, obs.data.values):.3f}")
    print(f"RMSE vs obs: {bet.metrics.rmse(posterior, obs.data.values):.3f}")


if __name__ == "__main__":
    main()
