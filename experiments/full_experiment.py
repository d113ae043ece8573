"""Full GMST experiment: all 7 SSP scenarios, warming projections + figures.

CLI equivalent of ``/root/reference/experiments/full_experiment_script.py``:
loads HadCRUT5 + CMIP6 GMST members, anomalises (1961-1990, annual), fits
GPDTW1D emulators (2000 iterations), CRPS-weights against observations,
combines with the W2 barycentre, prints 2050/2100 credible intervals and
saves per-scenario figures.

Usage:
    python experiments/full_experiment.py [--data-dir DIR] [--out-dir DIR]
        [--n-optim-nits N] [--ssps ssp119,ssp245,...] [--cpu]
        [--resample-freq M|Q|Y|none]   ('none' = native monthly, large-T path)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out-dir", default="figures")
    ap.add_argument("--n-optim-nits", type=int, default=2000)
    ap.add_argument("--ssps", default=None, help="comma-separated subset")
    ap.add_argument(
        "--resample-freq",
        default="Y",
        help="calendar resample frequency (M/Q/Y; 'none' keeps the native "
        "monthly resolution, the large-T path)",
    )
    ap.add_argument(
        "--sigma-mode",
        choices=["w2", "compat", "mixture"],
        default="w2",
        help="combined-sigma convention (schemes.Barycentre)",
    )
    ap.add_argument(
        "--fit-chunk-steps",
        type=int,
        default=None,
        help="split the hyperparameter optimisation into host-level chunks "
        "of this many steps (bounds each XLA execution; same step "
        "sequence — for environments that kill long executions, e.g. "
        "native monthly T=1980 at 2000 iterations)",
    )
    from bayesian_ensembling_tpu.utils.cli import (
        add_dba_args,
        add_optimizer_arg,
        add_profile_arg,
        add_warm_time_args,
        apply_profile,
        validate_warm_time_args,
    )

    add_optimizer_arg(ap)
    add_warm_time_args(ap)
    add_profile_arg(ap)
    add_dba_args(ap)
    ap.add_argument(
        "--refine-f64",
        action="store_true",
        help="recompute the published posterior moments in float64 at the "
        "f32-converged hyperparameters (one emulated-f64 solve pass; "
        "removes the ~2e-4 degC f32 solve scatter — BASELINE.md "
        "'Matched-hyperparameter parity')",
    )
    ap.add_argument("--cpu", action="store_true", help="run the float64 CPU path")
    args = ap.parse_args()
    apply_profile(ap, args, resample_freq=args.resample_freq)
    validate_warm_time_args(ap, args, resample_freq=args.resample_freq)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import matplotlib.pyplot as plt
    import numpy as np

    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D
    from bayesian_ensembling_tpu.plotters import cmap, plot_posterior_temporal

    data_dir = args.data_dir or pipeline.default_data_dir()
    ssps = args.ssps.split(",") if args.ssps else list(pipeline.ALL_SSPS)
    os.makedirs(args.out_dir, exist_ok=True)

    dtype = np.float64 if args.cpu else np.float32
    freq = None if args.resample_freq.lower() == "none" else args.resample_freq
    obs = pipeline.load_observations(data_dir, resample_freq=freq)
    results = {}
    for ssp in ssps:
        hist, ssp_mc = pipeline.load_scenario(ssp, data_dir, resample_freq=freq)
        t0 = time.time()
        res = pipeline.run_scenario(
            hist, ssp_mc, obs, ssp,
            emulator=GPDTW1D(dtype=dtype),
            n_optim_nits=args.n_optim_nits,
            dba_iterations=args.dba_iterations,
            dba_method=args.dba_method,
            dba_tol=args.dba_tol,
            sigma_mode=args.sigma_mode,
            fit_chunk_steps=args.fit_chunk_steps,
            time_stride=args.time_stride,
            fine_steps=args.fine_steps,
            optimizer=args.optimizer,
            refine_f64=args.refine_f64,
        )
        results[ssp] = res
        summ = pipeline.warming_summary(res)
        for year, (mean, lo, hi) in summ.items():
            print(
                f"{ssp} mean at {year}: {mean:.3f} ({lo:.3f}-{hi:.3f}) "
                "95% credible interval"
            )
        print(f"{ssp}: {time.time() - t0:.1f}s", flush=True)

        fig, ax = plt.subplots(figsize=(6.5, 4))
        plot_posterior_temporal(res.barycentre, ax=ax, color=cmap()[0], label=ssp, n_sigma=(2,))
        ax.set_xlabel("Time")
        ax.set_ylabel("Temperature anomaly (degC)\nrelative to 1961-1990")
        ax.legend()
        fig.savefig(
            os.path.join(args.out_dir, f"{ssp}_with_95percent_credible_interval.pdf")
        )
        plt.close(fig)

    # Combined headline figure (ssp245/370/585 like the reference's figure 1).
    head = [s for s in ("ssp245", "ssp370", "ssp585") if s in results]
    if head:
        fig, ax = plt.subplots(figsize=(6.5, 4))
        for i, ssp in enumerate(head):
            plot_posterior_temporal(
                results[ssp].barycentre, ax=ax, color=cmap()[i], label=ssp, n_sigma=(2,)
            )
        ax.set_xlabel("Time")
        ax.set_ylabel("Temperature anomaly (degC)\nrelative to 1961-1990")
        ax.legend()
        fig.savefig(
            os.path.join(args.out_dir, "figure1_with_95percent_credible_interval.pdf")
        )
        plt.close(fig)


if __name__ == "__main__":
    main()
