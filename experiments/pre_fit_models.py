"""Pre-fit emulators and checkpoint the collections (pickle-free).

CLI equivalent of ``/root/reference/experiments/pre_fitting_cmip6models.py``:
fits GPDTW1D on the historical + SSP collections and saves them so perfect
model tests can reuse the (expensive) fits.  Checkpoints are npz archives
(ModelCollection.save) instead of pickles of live TF objects.

Usage:
    python experiments/pre_fit_models.py [--data-dir DIR] [--out-dir DIR]
        [--n-optim-nits N] [--ssps ssp119,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out-dir", default="pre_fit_models")
    ap.add_argument("--n-optim-nits", type=int, default=2500)
    ap.add_argument(
        "--ssps",
        default="ssp119,ssp126,ssp245,ssp370,ssp434,ssp460,ssp585",
    )
    ap.add_argument(
        "--resample-freq",
        default="Y",
        help="calendar resample frequency (M/Q/Y; 'none' keeps the native "
        "monthly resolution, the large-T path — same convention as "
        "full_experiment.py)",
    )
    ap.add_argument(
        "--fit-chunk-steps",
        type=int,
        default=None,
        help="split the hyperparameter optimisation into host-level chunks "
        "of this many steps (same step sequence; bounds each XLA "
        "execution — use when the environment kills long single "
        "executions, e.g. ~2500 steps at native monthly T=1980)",
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
    args = ap.parse_args()
    apply_profile(ap, args, resample_freq=args.resample_freq)
    validate_warm_time_args(ap, args, resample_freq=args.resample_freq)


    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D

    data_dir = args.data_dir or pipeline.default_data_dir()
    os.makedirs(args.out_dir, exist_ok=True)
    freq = None if args.resample_freq.lower() == "none" else args.resample_freq

    for ssp in args.ssps.split(","):
        hist, ssp_mc = pipeline.load_scenario(ssp, data_dir, resample_freq=freq)
        t0 = time.time()
        fit_kw = dict(
            n_optim_nits=args.n_optim_nits,
            dba_iterations=args.dba_iterations,
            dba_method=args.dba_method,
            dba_tol=args.dba_tol,
            fit_chunk_steps=args.fit_chunk_steps,
            time_stride=args.time_stride,
            fine_steps=args.fine_steps,
            optimizer=args.optimizer,
        )
        hist.fit(GPDTW1D(), **fit_kw)
        ssp_mc.fit(GPDTW1D(), **fit_kw)
        # Posterior arrays are asynchronously dispatched device values; sync
        # before reading the clock or the time lands in the save step (a
        # compile-cache hit can print "0.0s" for a multi-second fit).
        from bayesian_ensembling_tpu.utils.profiling import device_sync

        for mc in (hist, ssp_mc):
            for pm in mc:
                if pm.posterior is not None:
                    device_sync(pm.posterior.gaussian.mean)
        print(f"{ssp}: fitted in {time.time() - t0:.1f}s", flush=True)
        hist.save(os.path.join(args.out_dir, f"hist_{ssp}.npz"))
        ssp_mc.save(os.path.join(args.out_dir, f"{ssp}.npz"))
        print(f"{ssp}: saved", flush=True)


if __name__ == "__main__":
    main()
