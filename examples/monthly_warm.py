"""Native-monthly (large-T) pipeline with the coarse-to-fine-in-time fit.

The quickstart resamples to annual means; this example keeps the synthetic
data at its native monthly resolution — the regime where the batched GP fit
leaves the Pallas batch-in-lanes kernels for the blocked large-T path — and
fits with ``time_stride``/``fine_steps``: a cheap coarse pass on every 12th
timestep, then a short warm-started fine pass at full T.  On real data this
is both faster AND closer to the converged optimum than the scratch fit
(BASELINE.md "Coarse-to-fine IN TIME"; the real-data equivalent is

    python experiments/full_experiment.py --resample-freq none \
        --n-optim-nits 500 --time-stride 12 --fine-steps 100

on the bundled CMIP6/HadCRUT5 data).  Runs everywhere (CPU included); the
shapes here are kept small so it finishes in seconds.

    python examples/monthly_warm.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bayesian_ensembling_tpu as bet
from bayesian_ensembling_tpu.coords import DimArray


def synthetic_model(rng, name, n_reals, n_months=240, offset=0.0):
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

    # 1. Native monthly anomalies: NO resample_freq — T stays at 240 here
    #    (1,980 on the real historical data).
    models = [
        synthetic_model(rng, f"model{i}", n_reals=3, offset=0.1 * i)
        for i in range(4)
    ]
    collection = bet.ModelCollection(
        [m.calculate_anomaly(("1961-01-01", "1970-12-31")) for m in models]
    )
    obs = synthetic_model(rng, "obs", n_reals=6).calculate_anomaly(
        ("1961-01-01", "1970-12-31")
    )

    # 2. Coarse-to-fine-in-time fit: 150 coarse steps on every 12th month
    #    (annual sampling of the monthly anomalies — the hyperparameter
    #    optimum is close), then 30 warm-started steps at full monthly T.
    #    A scratch fit of comparable quality would spend its full step
    #    count at the expensive full-T resolution.
    collection.fit(
        bet.GPDTW1D(), n_optim_nits=150, time_stride=12, fine_steps=30
    )

    # 3-4. Weight and combine exactly as at annual resolution.
    weights = bet.CRPSWeight()(collection, obs)
    posterior = bet.Barycentre()(collection, weights, sigma_mode="mixture")
    mean, sd = posterior.mean, posterior.stddev
    print(f"monthly ensemble mean at final month: {mean.values[-1]:.3f} "
          f"(+-2sd {mean.values[-1]-2*sd.values[-1]:.3f}"
          f"..{mean.values[-1]+2*sd.values[-1]:.3f})")
    print(f"NLL vs obs: {bet.metrics.nll(posterior, obs.data.values):.3f}")


if __name__ == "__main__":
    main()
