"""Measure the mean-target variants on the real bundled data (VERDICT r3 #2/#3).

Three mean-target algorithms exist for the emulation preamble:

* ``classic-10`` — exact-mean-update DBA at the fixed 10-iteration
  convention (the repo's established workload-parity default; the
  reference's own from-scratch ``dtwa.py:6``).
* ``classic-tol`` — the same update rule run to movement convergence
  (``dba_batch(tol=...)``, cap 100): the *converged* mean target.
* ``subgradient`` — tslearn's stochastic subgradient DBA with
  ``max_iter=50, tol=1e-3``: what the reference flagship ACTUALLY calls
  (``/root/reference/ensembles/models.py:176-178``).

Modes:

``barycentre`` (default)
    Per-model barycentre deltas + wall-clock for the three variants at the
    three real resolutions: annual historical (T=165), native-monthly SSP
    (T=1032), native-monthly historical (T=1980).  This quantifies how far
    the DBA-10 convention sits from the reference's actual algorithm and
    from the converged target.

``end2end``
    The full 7-SSP annual experiment (2000-step fits) re-run with each
    variant's mean target; reports pointwise barycentre-moment deltas and
    2100 warming per scenario vs the classic-10 production run.

Usage: python benchmarks/dba_variants_bench.py [barycentre|end2end]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _variants(block, mask, tol=1e-3):
    """Run the three mean-target variants; returns {name: (centres, secs)}."""
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.ops import dtw as dtw_ops

    block_np = np.asarray(block)
    block = jnp.asarray(block)
    mask = jnp.asarray(mask)
    out = {}

    def timed(name, fn):
        c = fn(block)  # compile + warm
        jax.block_until_ready(c)
        centres = np.asarray(c, np.float64)
        # Timing reps re-upload the SAME real operand from a fresh host
        # array each time: re-dispatching onto an already-seen device
        # buffer was observed to return in ~0.04 ms on the tunnelled
        # backend (vs ~48 ms from a fresh upload of identical values,
        # measured in-session), and block_until_ready alone does not
        # defeat that. Timing the real data — not a perturbed copy —
        # keeps the walls coupled to the reported centres, which matters
        # for the tol-stopped variants whose trip counts are
        # data-dependent.
        best = float("inf")
        for _ in range(3):
            b = jnp.asarray(block_np.copy())
            jax.block_until_ready(b)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(b))
            best = min(best, time.perf_counter() - t0)
        out[name] = (centres, best)

    timed("classic10", lambda b: dtw_ops.dba_batch(b, mask, n_iterations=10))
    timed(
        "classic_tol",
        lambda b: dtw_ops.dba_batch(b, mask, n_iterations=100, tol=tol),
    )
    timed(
        "subgradient",
        lambda b: dtw_ops.dba_subgradient_batch(b, mask, max_iter=50, tol=tol),
    )
    return out


def _delta_table(out):
    pairs = [
        ("classic10", "subgradient"),
        ("classic10", "classic_tol"),
        ("classic_tol", "subgradient"),
    ]
    rows = {}
    for a, b in pairs:
        d = np.abs(out[a][0] - out[b][0])
        rows[f"{a}_vs_{b}"] = {
            "max": round(float(d.max()), 5),
            "mean": round(float(d.mean()), 5),
        }
    return rows


def barycentre_mode():
    from bayesian_ensembling_tpu import pipeline

    results = {}
    workloads = []
    # Annual historical (the flagship resolution).
    hist_a, ssp_a = pipeline.load_scenario("ssp585", resample_freq="Y")
    ha, hm = hist_a.padded_stack()
    workloads.append(("annual_hist_T165", ha, hm))
    # Native monthly.
    hist_m, ssp_m = pipeline.load_scenario("ssp585", resample_freq=None)
    sb, sm = ssp_m.padded_stack()
    workloads.append(("monthly_ssp_T1032", sb, sm))
    hb, hmm = hist_m.padded_stack()
    workloads.append(("monthly_hist_T1980", hb, hmm))

    for name, block, mask in workloads:
        log(f"--- {name}: block {block.shape}")
        out = _variants(block, mask)
        rec = {"deltas_degC": _delta_table(out)}
        for k, (_, secs) in out.items():
            rec[f"{k}_s"] = round(secs, 3)
        results[name] = rec
        log(json.dumps({name: rec}))
    print(json.dumps({"metric": "dba_variants_barycentre", "results": results}))


def end2end_mode():
    import functools

    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.parallel.step import ensemble_multi_scenario_step

    *stacked, ssp_names = pipeline.load_packed_scenarios()
    hb, hm, sb, sm, mmask = (jnp.asarray(a) for a in stacked)
    obs = jnp.asarray(
        pipeline.load_observations().data.values, dtype=jnp.float32
    )

    def run(**dba_kw):
        step = jax.jit(
            functools.partial(
                ensemble_multi_scenario_step, n_optim_nits=2000, **dba_kw
            )
        )
        out = step(hb, hm, sb, sm, obs, mmask)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = step(hb, hm, sb, sm, obs, mmask)
        jax.block_until_ready(out)
        return (
            np.asarray(out[0], np.float64),
            np.asarray(out[1], np.float64),
            time.perf_counter() - t0,
        )

    base_m, base_s, base_secs = run()  # classic-10 production
    results = {"classic10_s": round(base_secs, 3)}
    for name, kw in [
        ("subgradient", dict(dba_method="subgradient", dba_iterations=50)),
        ("classic_tol", dict(dba_iterations=100, dba_tol=1e-3)),
    ]:
        m, s, secs = run(**kw)
        per_ssp = {}
        for i, ssp in enumerate(ssp_names):
            per_ssp[ssp] = {
                "dmean_max": round(float(np.abs(m[i] - base_m[i]).max()), 5),
                "dstd_max": round(float(np.abs(s[i] - base_s[i]).max()), 5),
                "warming2100": round(float(m[i][-1]), 3),
                "warming2100_classic10": round(float(base_m[i][-1]), 3),
            }
        results[name] = {
            "seconds": round(secs, 3),
            "dmean_max_all": round(float(np.abs(m - base_m).max()), 5),
            "dstd_max_all": round(float(np.abs(s - base_s).max()), 5),
            "per_ssp": per_ssp,
        }
        log(json.dumps({name: results[name]}, indent=1))
    print(json.dumps({"metric": "dba_variants_end2end", "results": results}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "barycentre"
    if mode == "barycentre":
        barycentre_mode()
    elif mode == "end2end":
        end2end_mode()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
