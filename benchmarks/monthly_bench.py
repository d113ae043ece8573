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
           [time_stride] [fine_steps] [optimizer]
       python benchmarks/monthly_bench.py all [n_optim_nits] [dba_iters] [hist_chunk]
           [time_stride] [fine_steps] [optimizer]
           (stride > 1 = coarse-to-fine in time; optimizer "bfgs" = the
            per-model damped quasi-Newton, ops/gp._build_batch_step)
       python benchmarks/monthly_bench.py all-nodedup ...   (replicated layout)
       python benchmarks/monthly_bench.py all-sharded-slab [n_iters] [dba]
           [n_way] [stride] [fine] [opt]
           (per-device slab of the SHARDED campaign program — the v5e-8
            estimate's measured basis; parallel/campaign.py)

``all`` runs the ENTIRE 7-SSP experiment at native monthly resolution,
fitting each UNIQUE model once (a historical model's anomalies are
scenario-independent, so the 7x16 scenario layout holds only ~20 distinct
historical + ~80 distinct SSP fits — see run_all_ssps).  The merged SSP
batch crosses the blocked hybrid's gate (ops/linalg_blocked.py on the
MXU); the T = 1980 historical emulations are host-pipelined in HBM-sized
model chunks when needed (a merged replicated T=1980 program needs
~1.76 GB per gram buffer and measured RESOURCE_EXHAUSTED on one v5e
chip); the weighting/barycentre tail is the production
parallel/step.multi_scenario_tail.
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
    if ssp == "all-sharded-slab":
        n_way = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        time_stride = int(sys.argv[5]) if len(sys.argv) > 5 else 1
        fine_steps = (
            int(sys.argv[6])
            if len(sys.argv) > 6 and sys.argv[6] not in ("0", "none")
            else None
        )
        optimizer = sys.argv[7] if len(sys.argv) > 7 else "adam"
        return run_sharded_slab(
            n_iters, dba_iters, n_way=n_way, time_stride=time_stride,
            fine_steps=fine_steps, optimizer=optimizer,
        )
    if ssp in ("all", "all-nodedup"):
        hist_chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 28
        time_stride = int(sys.argv[5]) if len(sys.argv) > 5 else 1
        fine_steps = (
            int(sys.argv[6])
            if len(sys.argv) > 6 and sys.argv[6] not in ("0", "none")
            else None
        )
        optimizer = sys.argv[7] if len(sys.argv) > 7 else "adam"
        return run_all_ssps(
            n_iters, dba_iters, hist_chunk, dedup=ssp == "all",
            time_stride=time_stride, fine_steps=fine_steps,
            optimizer=optimizer,
        )
    s_stride = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    s_fine = (
        int(sys.argv[5])
        if len(sys.argv) > 5 and sys.argv[5] not in ("0", "none")
        else None
    )
    s_opt = sys.argv[6] if len(sys.argv) > 6 else "adam"

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
            time_stride=s_stride,
            fine_steps=s_fine,
            optimizer=s_opt,
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
    warm_tag = f"_warm{s_stride}x{s_fine}" if s_stride > 1 else ""
    if s_opt != "adam":
        warm_tag += f"_{s_opt}"
    print(json.dumps({
        "metric": f"monthly_{ssp}_M{m}_Th{t_hist}_fit{n_iters}{warm_tag}",
        "value": round(elapsed, 3),
        "unit": "s",
    }))



def build_all_ssps_runner(
    scenarios, obs, n_iters: int, dba_iters: int, hist_chunk: int, dedup: bool,
    time_stride: int = 1, fine_steps=None, optimizer: str = "adam",
):
    """Pack the scenario collections and build the campaign runner.

    ``scenarios`` is a list of ``(name, hist_collection, ssp_collection)``.
    Returns ``(run_once, meta)`` where ``run_once()`` executes the whole
    campaign (chunked/deduped emulation + the production
    ``multi_scenario_tail``) and ``meta`` describes the packing.  Separate
    from ``run_all_ssps`` so the dedup-vs-replicated equality is testable
    on synthetic collections (tests/test_parallel.py).

    With ``dedup=True``, each UNIQUE model is fitted once: historical
    anomalies are scenario-independent (asserted byte-identical at pack
    time), so the padded (S, M) scenario layout gathers its marginals from
    ~20 distinct historical and ~80 distinct SSP fits instead of
    re-emulating every (scenario, model) slot.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.parallel.campaign import (
        pack_dedup_campaign,
        run_dedup_campaign,
    )
    from bayesian_ensembling_tpu.parallel.step import (
        chunked_marginals,
        emulate_marginals,
        multi_scenario_tail,
    )

    pack = pack_dedup_campaign(scenarios)
    s, m_max = pack.mmask.shape
    r_max = pack.hb.shape[2]
    b = s * m_max
    t_hist, t_ssp = pack.hb.shape[-1], pack.sb.shape[-1]
    fit_kw = dict(
        n_optim_nits=n_iters,
        dba_iterations=dba_iters,
        time_stride=time_stride,
        fine_steps=fine_steps,
        optimizer=optimizer,
    )

    if dedup:
        u, b_ssp = pack.uh.shape[0], pack.usb.shape[0]
        n_fits = pack.n_fits
        desc = (
            f"ALL {s} SSPs, DEDUPED — {u} unique historical + {b_ssp} SSP "
            f"fits (replicated layout: {b}+{b}), R={r_max}, "
            f"T_hist={t_hist}, T_ssp={t_ssp}"
        )

        def run_once():
            return run_dedup_campaign(
                pack, obs, hist_chunk=hist_chunk, **fit_kw
            )

    else:
        hb, hm, sb, sm, mmask = (
            jnp.asarray(a) for a in (pack.hb, pack.hm, pack.sb, pack.sm, pack.mmask)
        )
        em = jax.jit(functools.partial(emulate_marginals, **fit_kw))
        tail = jax.jit(multi_scenario_tail)
        n_fits = 2 * b
        desc = (
            f"ALL {s} SSPs, merged batch {s}x{m_max}={b} models "
            f"(hist chunked at {hist_chunk}), R={r_max}, "
            f"T_hist={t_hist}, T_ssp={t_ssp}"
        )

        def run_once():
            h_mu, h_var = chunked_marginals(
                em, hb.reshape(b, r_max, t_hist), hm.reshape(b, r_max), hist_chunk
            )
            s_mu, s_var = em(sb.reshape(b, r_max, t_ssp), sm.reshape(b, r_max))
            return tail(
                h_mu.reshape(s, m_max, t_hist),
                h_var.reshape(s, m_max, t_hist),
                s_mu.reshape(s, m_max, t_ssp),
                s_var.reshape(s, m_max, t_ssp),
                obs,
                hb,
                hm,
                mmask,
            )

    meta = {"s": s, "m_max": m_max, "r_max": r_max, "n_fits": n_fits, "desc": desc}
    return run_once, meta


def run_sharded_slab(
    n_iters: int, dba_iters: int, n_way: int = 8,
    time_stride: int = 1, fine_steps=None, optimizer: str = "adam",
):
    """Per-device slab of the SHARDED campaign program (VERDICT r3 item 5).

    Runs ``parallel.campaign.make_sharded_dedup_campaign`` — the exact
    program the 8-way estimate cites, equality-tested against the
    single-chip dedup campaign on the virtual mesh
    (tests/test_campaign_sharded.py) and exercised by ``dryrun_multichip``
    — on a ONE-device mesh whose unique-fit axes hold exactly the
    ``n_way``-way per-device share (``ceil(U/8)`` historical +
    ``ceil(B_ssp/8)`` SSP fits).  What this measures is what each of 8
    chips would execute concurrently: the collective-free sharded
    emulation stage at per-device batch size, plus the FULL production
    tail (on real hardware the tail's collectives ride ICI at ~µs scale;
    counting the whole single-chip tail here makes the estimate
    conservative).  The gather maps are remapped into the slab
    (``idx % share``) so the tail sees the production (S, M, T) layout.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.parallel.campaign import (
        make_sharded_dedup_campaign,
        pack_dedup_campaign,
    )
    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    obs_pm = pipeline.load_observations(resample_freq=None)
    obs = jnp.asarray(obs_pm.data.values, dtype=jnp.float32)
    scenarios = []
    for ssp in pipeline.ALL_SSPS:
        hist, ssp_mc = pipeline.load_scenario(ssp, resample_freq=None)
        scenarios.append((ssp, hist, ssp_mc))
    pack = pack_dedup_campaign(scenarios)
    u, b_ssp = pack.uh.shape[0], pack.usb.shape[0]
    u_share = -(-u // n_way)
    s_share = -(-b_ssp // n_way)
    print(
        f"devices: {jax.devices()}\nworkload: {n_way}-way per-device slab of "
        f"the sharded dedup campaign — {u_share}/{u} historical + "
        f"{s_share}/{b_ssp} SSP fits on this chip, "
        f"T_hist={pack.uh.shape[-1]}, T_ssp={pack.usb.shape[-1]}, "
        f"{n_iters} iterations",
        file=sys.stderr,
    )

    mesh = Mesh(np.array(jax.devices()[:1]), ("model",))
    campaign = make_sharded_dedup_campaign(
        mesh, n_optim_nits=n_iters, dba_iterations=dba_iters,
        time_stride=time_stride, fine_steps=fine_steps, optimizer=optimizer,
    )
    args = (
        jnp.asarray(pack.uh[:u_share]), jnp.asarray(pack.um[:u_share]),
        jnp.asarray(pack.usb[:s_share]), jnp.asarray(pack.usm[:s_share]),
        jnp.asarray(pack.uidx % u_share), jnp.asarray(pack.sidx % s_share),
        obs, jnp.asarray(pack.hb), jnp.asarray(pack.hm),
        jnp.asarray(pack.mmask),
    )

    t0 = time.perf_counter()
    sync(campaign(*args))
    print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    elapsed = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        out = campaign(*args)
        sync(out)
        rep_s = time.perf_counter() - t0
        print(f"rep {rep}: {rep_s:.2f}s", file=sys.stderr)
        elapsed = min(elapsed, rep_s)
    bmean = np.asarray(out[0])
    assert np.isfinite(bmean).all()
    warm_tag = f"_warm{time_stride}x{fine_steps}" if time_stride > 1 else ""
    if optimizer != "adam":
        warm_tag += f"_{optimizer}"
    print(json.dumps({
        "metric": f"monthly_campaign_sharded_slab_{n_way}way_opt{n_iters}"
                  f"{warm_tag}",
        "value": round(elapsed, 3),
        "unit": "s",
        "v5e8_estimate": round(elapsed, 3),
        "note": "per-device slab of the sharded program incl. full tail",
    }))


def run_all_ssps(
    n_iters: int, dba_iters: int, hist_chunk: int = 28, dedup: bool = True,
    time_stride: int = 1, fine_steps=None, optimizer: str = "adam",
):
    """Full 7-SSP experiment at native monthly resolution.

    The T = 1032 SSP emulations run as ONE merged program — the batch
    crosses the blocked hybrid's gate, so they go through
    ops/linalg_blocked.py on the MXU — and the T = 1980 historical
    emulations are host-pipelined in ``hist_chunk``-model chunks when they
    exceed HBM (see parallel/step.chunked_marginals).  The weighting + barycentre tail
    is the production ``multi_scenario_tail`` program.

    ``dedup=True`` (default) fits each UNIQUE model once instead of once
    per scenario: a historical model's anomaly series is byte-identical
    across every SSP collection it appears in (asserted at pack time), so
    the 7x16 padded scenario layout contains only ~20 distinct historical
    fits and ~80 distinct SSP fits.  At monthly T the XLA/blocked fit cost
    is linear in batch (unlike the annual regime, where the 128-wide
    batch-in-lanes Pallas kernels price B=20 and B=112 identically), so
    experiment-level common-subexpression elimination is a direct
    wall-clock cut at bit-identical per-model math.  Marginals are gathered
    back into the (S, M) scenario layout for the unchanged tail.
    ``dedup=False`` reproduces the replicated layout.
    """
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    obs_pm = pipeline.load_observations(resample_freq=None)
    obs = jnp.asarray(obs_pm.data.values, dtype=jnp.float32)
    scenarios = []
    for ssp in pipeline.ALL_SSPS:
        hist, ssp_mc = pipeline.load_scenario(ssp, resample_freq=None)
        scenarios.append((ssp, hist, ssp_mc))
    run_once, meta = build_all_ssps_runner(
        scenarios, obs, n_iters, dba_iters, hist_chunk=hist_chunk, dedup=dedup,
        time_stride=time_stride, fine_steps=fine_steps, optimizer=optimizer,
    )
    print(
        f"devices: {jax.devices()}\nworkload: {meta['desc']}, "
        f"{n_iters} iterations",
        file=sys.stderr,
    )

    t0 = time.perf_counter()
    sync(run_once())
    print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    out = run_once()
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
    warm_tag = f"_warm{time_stride}x{fine_steps}" if time_stride > 1 else ""
    if optimizer != "adam":
        warm_tag += f"_{optimizer}"
    print(json.dumps({
        "metric": f"monthly_all7ssp_{'dedup' if dedup else 'merged'}"
                  f"{meta['n_fits']}fits_opt{n_iters}{warm_tag}",
        "value": round(elapsed, 3),
        "unit": "s",
    }))


if __name__ == "__main__":
    main()
