"""Perfect-model-test driver over SSPs x weighting schemes.

CLI equivalent of
``/root/reference/experiments/PMT/template_pmt/perfect_model_tests.py``:
for each requested scenario and weight class, run the leave-one-out
PerfectModelTest with the barycentre scheme and write CSVs/figures.

Usage:
    python experiments/perfect_model_tests.py [--data-dir DIR] [--out-dir DIR]
        [--ssps ssp370] [--weights CRPSWeight,LogLikelihoodWeight]
        [--n-optim-nits N] [--prefit-dir DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out-dir", default="pmt_results")
    ap.add_argument(
        "--ssps",
        default="ssp119,ssp126,ssp245,ssp370,ssp434,ssp460,ssp585",
    )
    ap.add_argument(
        "--weights",
        default="LogLikelihoodWeight,InverseSquareWeight,UniformWeight,KSDWeight,CRPSWeight",
    )
    ap.add_argument("--n-optim-nits", type=int, default=1000)
    ap.add_argument("--prefit-dir", default=None, help="use checkpointed fits")
    ap.add_argument("--include-sim", action="store_true")
    ap.add_argument(
        "--compat-fixed-point",
        action="store_true",
        help="use the reference-faithful fixed-point barycentre sigma "
        "(alias for --sigma-mode compat)",
    )
    ap.add_argument(
        "--sigma-mode",
        choices=["w2", "compat", "mixture"],
        default=None,
        help="combined sigma: 'w2' closed-form barycentre (default), "
        "'compat' reference fixed point, 'mixture' moment-matched mixture "
        "variance (the calibrated option)",
    )
    ap.add_argument(
        "--batched",
        action="store_true",
        help="all leave-one-out folds in one XLA program (prefit only; "
        "validation.batched_pmt)",
    )
    ap.add_argument(
        "--figures",
        action="store_true",
        help="with --batched: also draw the per-fold weight/projection "
        "figures from the batched program's outputs",
    )
    ap.add_argument(
        "--resample-freq",
        default="Y",
        help="calendar resample frequency for freshly-loaded scenarios "
        "(M/Q/Y; 'none' = native monthly, the large-T path).  Ignored with "
        "--prefit-dir, whose checkpoints fix the resolution.",
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
    if args.profile != "faithful" and args.prefit_dir:
        ap.error("--profile applies to fresh fits only; --prefit-dir "
                 "checkpoints fix the fit")
    apply_profile(ap, args, resample_freq=args.resample_freq)
    validate_warm_time_args(
        ap, args, resample_freq=args.resample_freq, prefit_dir=args.prefit_dir
    )
    if args.batched and not args.prefit_dir:
        # Fail at parse time, before loading/anomalising every scenario.
        raise SystemExit("--batched requires --prefit-dir")
    if args.compat_fixed_point and args.sigma_mode not in (None, "compat"):
        # The alias must not silently discard an explicit conflicting mode —
        # the CSVs would be labelled one way and computed the other.
        ap.error(
            f"--compat-fixed-point conflicts with --sigma-mode {args.sigma_mode}"
        )
    sigma_mode = "compat" if args.compat_fixed_point else (args.sigma_mode or "w2")

    import bayesian_ensembling_tpu as bet
    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D
    from bayesian_ensembling_tpu.validation import PerfectModelTest, load_model_collection

    data_dir = args.data_dir or pipeline.default_data_dir()

    ssps = args.ssps.split(",")
    collections = {}
    for ssp in ssps:
        if args.prefit_dir:
            hist = load_model_collection(os.path.join(args.prefit_dir, f"hist_{ssp}.npz"))
            fore = load_model_collection(os.path.join(args.prefit_dir, f"{ssp}.npz"))
            use_prefit = True
        else:
            freq = (
                None
                if args.resample_freq.lower() == "none"
                else args.resample_freq
            )
            hist, fore = pipeline.load_scenario(ssp, data_dir, resample_freq=freq)
            use_prefit = False
        collections[ssp] = (hist, fore, use_prefit)

    # Campaign-wide shape bucket: one compiled program per weighter across
    # every scenario (validation.batched_pmt pad_shape).
    pad_shape = None
    if args.batched and len(collections) > 1:
        pad_m = max(len(h) for h, _, _ in collections.values())
        pad_r = max(
            max(pm.n_realisations for pm in mc)
            for h, f, _ in collections.values()
            for mc in (h, f)
        )
        pad_shape = (pad_m, pad_r)
        print(f"shape bucket: pad_m={pad_m}, pad_r={pad_r}", flush=True)

    for ssp in ssps:
        hist, fore, use_prefit = collections[ssp]
        for wname in args.weights.split(","):
            weight_cls = getattr(bet, wname)
            pmt = PerfectModelTest(
                hindcast_models=hist,
                forecast_models=fore,
                emulate_method=GPDTW1D,
                weight_method=weight_cls,
                ensemble_method=bet.Barycentre,
                ssp=ssp,
                include_sim=args.include_sim,
                save_dir=os.path.join(args.out_dir, ssp),
                scheme_kwargs={"sigma_mode": sigma_mode},
            )
            if args.batched:
                df = pmt.run_batched(pad_shape=pad_shape, figures=args.figures)
            else:
                df = pmt.run(
                    n_optim_nits=args.n_optim_nits,
                    use_prefit_models=use_prefit,
                    time_stride=args.time_stride,
                    fine_steps=args.fine_steps,
                    optimizer=args.optimizer,
                    dba_iterations=args.dba_iterations,
                    dba_method=args.dba_method,
                    dba_tol=args.dba_tol,
                )
            print(f"{ssp} / {wname}:\n{df.describe().loc[['mean']]}", flush=True)


if __name__ == "__main__":
    main()
