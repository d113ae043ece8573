"""Shared CLI plumbing for the experiment/serve entry points.

One owner for the coarse-to-fine-in-time options' argparse surface so the
four CLIs (full_experiment, pre_fit_models, perfect_model_tests, serve
build) stay consistent with each other and with the library contract in
``ops/gp.fit_gp_batch_dispatch``.
"""

from __future__ import annotations

import argparse
import sys
import typing as tp

__all__ = [
    "add_optimizer_arg",
    "add_warm_time_args",
    "validate_warm_time_args",
    "add_profile_arg",
    "add_dba_args",
    "apply_profile",
]


def add_optimizer_arg(ap: argparse.ArgumentParser) -> None:
    """Add ``--optimizer`` with the shared help text."""
    ap.add_argument(
        "--optimizer",
        choices=["adam", "lbfgs", "bfgs"],
        default="adam",
        help="hyperparameter optimiser: 'adam' (reference-faithful, the "
        "default), 'lbfgs' (optax zoom linesearch — right for single "
        "fits, measured slower for merged batches), or 'bfgs' (per-model "
        "damped quasi-Newton — converges in ~30 steps; pair with a small "
        "--n-optim-nits, e.g. 30-60; measured both faster AND closer to "
        "the converged optimum than adam-2000, BASELINE.md)",
    )


def add_warm_time_args(ap: argparse.ArgumentParser) -> None:
    """Add ``--time-stride`` / ``--fine-steps`` with the shared help text."""
    ap.add_argument(
        "--time-stride",
        type=int,
        default=1,
        help="coarse-to-fine-in-time fit: run the coarse step count on "
        "every Nth timestep, then --fine-steps warm-started steps at full "
        "resolution (ops/gp.fit_gp_batch_warm_time — measured faster AND "
        "closer to the converged optimum than the scratch fit at native "
        "monthly T, benchmarks/monthly_warm_bench.py; requires "
        "--fine-steps)",
    )
    ap.add_argument(
        "--fine-steps",
        type=int,
        default=None,
        help="full-resolution warm-started steps for --time-stride > 1",
    )


def add_dba_args(ap: argparse.ArgumentParser, default_iterations: int = 10) -> None:
    """Add ``--dba-iterations/--dba-method/--dba-tol`` with shared help."""
    ap.add_argument(
        "--dba-iterations", type=int, default=default_iterations,
        help="mean-target DBA iterations (classic: fixed count, the "
        "reference dtwa.py convention; subgradient: the epoch cap — the "
        "reference flagship passes 50)",
    )
    ap.add_argument(
        "--dba-method",
        choices=["classic", "subgradient"],
        default="classic",
        help="mean-target algorithm: 'classic' (exact-mean-update DBA, the "
        "established workload-parity convention) or 'subgradient' (the "
        "tslearn stochastic variant the reference flagship actually calls, "
        "models.py:176-178 — pair with --dba-iterations 50; tol defaults "
        "to 1e-3)",
    )
    ap.add_argument(
        "--dba-tol", type=float, default=None,
        help="convergence tolerance: classic — stop when the barycentre "
        "moves less than this between iterations (--dba-iterations becomes "
        "the cap; the CONVERGED mean target), subgradient — the "
        "epoch-to-epoch cost tolerance (default 1e-3)",
    )


def add_profile_arg(ap: argparse.ArgumentParser) -> None:
    """Add ``--profile`` with the shared help text (utils/profiles.py)."""
    ap.add_argument(
        "--profile",
        choices=["faithful", "fast"],
        default="faithful",
        help="fit preset: 'faithful' (the reference's conventions — scratch "
        "Adam, the surface defaults; algorithm-identity parity gates are "
        "defined here) or 'fast' (the measured-best schedule for the "
        "workload's regime — coarse-in-time bfgs at annual resolution, "
        "warm stride-12 Adam at native monthly, bfgs-30 for gridded fits; "
        "each measured faster AND at least as close to the converged "
        "optimum, BASELINE.md).  Mutually exclusive with setting "
        "--optimizer/--n-optim-nits/--time-stride/--fine-steps yourself.",
    )


def apply_profile(
    ap: argparse.ArgumentParser,
    args: argparse.Namespace,
    *,
    resample_freq: tp.Optional[str] = None,
    gridded: bool = False,
) -> None:
    """Expand ``--profile`` into the fit knobs on ``args`` (in place).

    The profile OWNS those knobs: if any of them was moved off its parser
    default alongside a non-faithful profile, that is two sources of truth
    for one setting — refuse loudly rather than guess precedence.
    """
    if getattr(args, "profile", "faithful") == "faithful":
        return
    knobs = ("n_optim_nits", "optimizer", "time_stride", "fine_steps")
    for k in knobs:
        if hasattr(args, k) and getattr(args, k) != ap.get_default(k):
            ap.error(
                f"--profile {args.profile} sets --{k.replace('_', '-')} "
                "itself; drop the explicit flag or use --profile faithful"
            )
    from bayesian_ensembling_tpu.utils.profiles import resolve_profile

    native_monthly = (
        resample_freq is not None and str(resample_freq).lower() == "none"
    )
    for k, v in resolve_profile(
        args.profile, native_monthly=native_monthly, gridded=gridded
    ).items():
        if hasattr(args, k):
            setattr(args, k, v)


def validate_warm_time_args(
    ap: argparse.ArgumentParser,
    args: argparse.Namespace,
    resample_freq: tp.Optional[str] = None,
    prefit_dir: tp.Optional[str] = None,
) -> None:
    """Parse-time enforcement of the warm-time option contract.

    Mirrors ``ops/gp.fit_gp_batch_dispatch``'s runtime checks so mistyped
    options fail before any data loads.  ``resample_freq`` (the CLI's
    resolved frequency string, ``None``/'none' = native monthly) triggers
    the at-resampled-resolution note; ``prefit_dir`` rejects the stride
    outright — prefit checkpoints fix the fit, so the option would be
    silently ignored.
    """
    if args.time_stride < 1:
        ap.error(f"--time-stride must be >= 1, got {args.time_stride}")
    if args.time_stride > 1 and args.fine_steps is None:
        ap.error("--time-stride > 1 requires --fine-steps")
    if args.fine_steps is not None and args.time_stride == 1:
        ap.error("--fine-steps only applies with --time-stride > 1")
    if args.time_stride > 1 and prefit_dir:
        ap.error(
            "--time-stride applies to fresh fits only; --prefit-dir "
            "checkpoints fix the fit, so the option would be silently "
            "ignored"
        )
    if (
        args.time_stride > 1
        and resample_freq is not None
        and str(resample_freq).lower() != "none"
        # The fast profile's annual schedule IS a stride-12 warm fit
        # (measured best-quality at annual resolution) — no note needed.
        and getattr(args, "profile", "faithful") == "faithful"
    ):
        print(
            "note: --time-stride targets the native monthly path; at "
            "resampled resolution the scratch fit is already in the Pallas "
            "fast regime",
            file=sys.stderr,
        )
