"""One-switch production fit profiles (VERDICT r3 item 6).

The best-measured production schedule existed only as scattered opt-in flags
(``--optimizer bfgs``, ``--time-stride/--fine-steps``, ``--resident``).
This module is the ONE owner of those presets so every surface —
``pipeline.run_scenario``, the experiment CLIs, serve build, and the
benches — reproduces the measured-best numbers with a single switch.

Profiles (measurements in BASELINE.md):

``faithful`` (default everywhere)
    The reference's own conventions — scratch Adam at the surface's default
    step count, classic DBA-10.  The algorithm-identity parity gates are
    defined on this profile.

``fast``
    The measured-best schedule per regime, each carrying its own quality
    gate in the bench that measured it:

    * annual / resampled 1-D (T <= ~200, the Pallas batch-in-lanes
      regime): coarse-in-time bfgs — 30 coarse steps at stride 12 + 20
      warm-started fine steps ("warm s12, bfgs 30 coarse + 20 fine":
      0.192 s for the full 7-SSP experiment, the best quality of ANY
      measured schedule — closer to the converged optimum than
      scratch-2000 on both moments).
    * native monthly (T = 1980/1032, the XLA/blocked regime):
      coarse-to-fine in time, 500 coarse steps at stride 12 + 100 fine
      Adam steps (7-SSP campaign 42.3 s -> 11.5 s, measured CLOSER to the
      converged optimum than scratch-500).
    * gridded per-cell fits: scratch bfgs-30 (5 deg grid 8.8 -> 1.67 s;
      1 deg `--resident` 34.1 s; gated by the IDENTITY gate against the
      f64 oracle running the identical 30-step bfgs fit).  Quality
      settled on the FULL 2,592-cell 5 deg grid vs an f64-refined
      adam-2000 truth (benchmarks/bfgs_quality_settle.py, round 5):
      bfgs-30 closeness-to-truth is a consistent ~5% WORSE than
      scratch-500 at every quantile (max 0.0536 vs 0.0508 degC, median
      ratio 1.05) at ~5x less steady wall (1.73 s vs 8.8 s on the 5 deg
      grid, BASELINE.md ledger) — quality-equivalent for practical
      purposes (both sit ~2x from truth vs scratch-1000's 0.0276).  The
      earlier 64-cell-subset comparisons flipping at +-10% are confirmed
      subset noise: bootstrapping 2,000 64-cell subsets puts the
      subset-max ratio at 0.91-1.20 (5-95%), P(bfgs worse) = 0.73 — the
      subset statistic cannot resolve a 5% margin, which is why the
      gridded fast profile publishes the identity gate (and the bench
      refuses to run the fast profile ungated).
"""

from __future__ import annotations

import typing as tp

__all__ = ["PROFILES", "resolve_profile"]

PROFILES = ("faithful", "fast")


def resolve_profile(
    name: str,
    *,
    native_monthly: bool = False,
    gridded: bool = False,
) -> tp.Dict[str, tp.Any]:
    """Fit-kwarg preset for ``name`` in the given regime.

    Returns a dict of ``n_optim_nits / optimizer / time_stride /
    fine_steps`` overrides; empty for ``faithful`` (surface defaults).
    """
    if name not in PROFILES:
        raise ValueError(f"unknown profile {name!r}; one of {PROFILES}")
    if name == "faithful":
        return {}
    if gridded:
        return {"n_optim_nits": 30, "optimizer": "bfgs"}
    if native_monthly:
        return {
            "n_optim_nits": 500,
            "optimizer": "adam",
            "time_stride": 12,
            "fine_steps": 100,
        }
    return {
        "n_optim_nits": 30,
        "optimizer": "bfgs",
        "time_stride": 12,
        "fine_steps": 20,
    }
