"""Monthly-resolution (large-T) experiment benchmark.

The flagship bench resamples to annual means (T = 165) like the reference's
experiment (full_experiment_script.py:77-83).  This bench keeps the bundled
CMIP6/HadCRUT5 data at its NATIVE monthly resolution — T = 1980 historical /
1032 SSP steps — which is the regime where the batch-in-lanes Pallas linalg
kernels hand over to XLA's blocked decompositions
(ops/linalg_pallas.linalg_path: one (T, T, 128) f32 VMEM buffer caps them at
T ~ 169) and the DTW/DBA kernels shrink their lane chunks to fit VMEM.

Workload: one scenario (default ssp585, the largest), DBA + exact
heteroskedastic GP per member at monthly resolution, CRPS weights vs monthly
HadCRUT5, W2 barycentre.  Prints one JSON line.

Usage: python benchmarks/monthly_bench.py [ssp] [n_optim_nits] [dba_iters]
       python benchmarks/monthly_bench.py all [n_optim_nits] [dba_iters]

``all`` runs the ENTIRE 7-SSP experiment at native monthly resolution as
one merged (scenario x model) program (parallel/step.py's multi-scenario
step) — the merged batch (7 x 16 padded models = 112) crosses the blocked
hybrid's batch gate, so the T = 1032 SSP emulations run through
ops/linalg_blocked.py on the MXU.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.parallel.step import ensemble_scenario_step

    ssp = sys.argv[1] if len(sys.argv) > 1 else "ssp585"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    dba_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    if ssp == "all":
        return run_all_ssps(n_iters, dba_iters)

    obs_pm = pipeline.load_observations(resample_freq=None)
    obs = jnp.asarray(obs_pm.data.values, dtype=jnp.float32)
    hist, ssp_mc = pipeline.load_scenario(ssp, resample_freq=None)
    r_max = max(hist.max_realisations, ssp_mc.max_realisations)
    hb, hm = hist.padded_stack(r_target=r_max)
    sb, sm = ssp_mc.padded_stack(r_target=r_max)
    m, _, t_hist = hb.shape
    t_ssp = sb.shape[-1]
    print(
        f"devices: {jax.devices()}\n"
        f"workload: {ssp} M={m} R={r_max} T_hist={t_hist} T_ssp={t_ssp}, "
        f"{n_iters} optimisation iterations, {dba_iters} DBA iterations",
        file=sys.stderr,
    )

    step = jax.jit(
        functools.partial(
            ensemble_scenario_step,
            n_optim_nits=n_iters,
            dba_iterations=dba_iters,
        )
    )
    args = (
        jnp.asarray(hb),
        jnp.asarray(hm),
        jnp.asarray(sb),
        jnp.asarray(sm),
        obs,
    )

    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    t0 = time.perf_counter()
    sync(step(*args))
    print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    out = step(*args)
    sync(out)
    elapsed = time.perf_counter() - t0

    bary_mean, bary_std, weights = (np.asarray(a) for a in out)
    assert np.isfinite(bary_mean).all() and np.isfinite(bary_std).all()
    assert (bary_std > 0).all()
    np.testing.assert_allclose(weights.sum(), 1.0, rtol=1e-4)
    print(
        f"{ssp} monthly: 2100 warming {bary_mean[-1]:.3f} "
        f"(+-2sd {bary_mean[-1] - 2 * bary_std[-1]:.3f}.."
        f"{bary_mean[-1] + 2 * bary_std[-1]:.3f})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"monthly_{ssp}_M{m}_Th{t_hist}_fit{n_iters}",
        "value": round(elapsed, 3),
        "unit": "s",
    }))



def run_all_ssps(n_iters: int, dba_iters: int):
    """Full 7-SSP experiment at native monthly resolution, ONE program."""
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.parallel.step import (
        ensemble_multi_scenario_step,
        pad_models,
    )
    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    obs_pm = pipeline.load_observations(resample_freq=None)
    obs = jnp.asarray(obs_pm.data.values, dtype=jnp.float32)
    scenarios = []
    for ssp in pipeline.ALL_SSPS:
        hist, ssp_mc = pipeline.load_scenario(ssp, resample_freq=None)
        scenarios.append((ssp, hist, ssp_mc))
    m_max = max(len(h) for _, h, _ in scenarios)
    r_max = max(max(h.max_realisations, s.max_realisations) for _, h, s in scenarios)
    packed = []
    for ssp, hist, ssp_mc in scenarios:
        hb, hm = hist.padded_stack(r_target=r_max)
        sb, sm = ssp_mc.padded_stack(r_target=r_max)
        hb, hm, mmask = pad_models(hb, hm, m_max)
        sb, sm, _ = pad_models(sb, sm, m_max)
        packed.append((hb, hm, sb, sm, mmask))
    stacked = [jnp.asarray(np.stack([p[i] for p in packed])) for i in range(5)]
    hb, hm, sb, sm, mmask = stacked
    s = hb.shape[0]
    print(
        f"devices: {jax.devices()}\n"
        f"workload: ALL {s} SSPs, merged batch {s}x{m_max}={s * m_max} "
        f"models, R={r_max}, T_hist={hb.shape[-1]}, T_ssp={sb.shape[-1]}, "
        f"{n_iters} iterations",
        file=sys.stderr,
    )
    step = jax.jit(
        functools.partial(
            ensemble_multi_scenario_step,
            n_optim_nits=n_iters,
            dba_iterations=dba_iters,
        )
    )
    t0 = time.perf_counter()
    sync(step(hb, hm, sb, sm, obs, mmask))
    print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    out = step(hb, hm, sb, sm, obs, mmask)
    sync(out)
    elapsed = time.perf_counter() - t0
    bmean, bstd, _ = (np.asarray(a) for a in out)
    assert np.isfinite(bmean).all() and np.isfinite(bstd).all()
    for i, (ssp, _, _) in enumerate(scenarios):
        print(
            f"{ssp} monthly: 2100 warming {bmean[i, -1]:.3f} "
            f"(+-2sd {bmean[i, -1] - 2 * bstd[i, -1]:.3f}.."
            f"{bmean[i, -1] + 2 * bstd[i, -1]:.3f})",
            file=sys.stderr,
        )
    print(json.dumps({
        "metric": f"monthly_all7ssp_merged{s * m_max}_fit{n_iters}",
        "value": round(elapsed, 3),
        "unit": "s",
    }))


if __name__ == "__main__":
    main()
