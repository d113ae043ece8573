"""Headline benchmark: full 7-SSP GMST experiment on the accelerator.

Workload = the reference's flagship experiment
(``/root/reference/experiments/full_experiment_script.py``): for each of the
7 SSP scenarios, emulate every CMIP6 member (DBA barycentre + heteroskedastic
GP, 2000 optimisation iterations), weight against HadCRUT5 (CRPS), and
combine with the W2 barycentre.  Here each scenario runs as ONE fused XLA
program (bayesian_ensembling_tpu/parallel/step.py); all scenarios share one
compiled executable via global (model, realisation) padding.

Prints exactly one JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
where vs_baseline = CPU-float64 reference-path seconds / this run's seconds
(the reference publishes no numbers — BASELINE.md records the self-measured
CPU anchor, benchmarks/cpu_baseline.json).
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

_CACHE_DIR = enable_persistent_cache()


def _fail_soft(status: str, probe_s: float | None, detail: str) -> None:
    """Emit a structured, parseable JSON line and exit 0.

    The round-3 driver artifact was EMPTY (rc=1, nothing parsed) because the
    probe raised SystemExit with a prose message when the tunnel was down —
    the bench must always leave a machine-readable record, even when it
    cannot measure (VERDICT r3 "Next round" item 1)."""
    print(detail, file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "gmst_full_experiment_7ssp_fit2000_weight_barycentre",
        "value": None,
        "unit": "s",
        "vs_baseline": None,
        "status": status,
        "probe_s": round(probe_s, 1) if probe_s is not None else None,
        "warmup_s": None,
        "detail": detail[-500:],
        # Last driver-verified figure for reference (BENCH_r02.json) plus the
        # builder-measured round-3/4 steady state, so an unreachable-backend
        # round still records what the framework measures when the chip is up.
        "last_known_good": {"value": 1.226, "round": "r02",
                            "builder_measured_r03": 1.22},
    }))
    raise SystemExit(0)


def _probe_backend(timeout_s: int = 180) -> None:
    """Probe the accelerator; on failure emit structured JSON and exit 0.

    The tunnelled TPU plugin can block ~30 minutes inside backend init when
    the chip/tunnel is down; a subprocess probe with a hard timeout turns
    that into a quick, *parseable* failure record instead of silently eating
    the whole measurement window.  A healthy-but-congested tunnel has been
    measured to take >2 minutes for backend init, so the probe escalates
    through three budgets (default 180/360/720 s) before giving up.
    Skippable via BENCH_SKIP_PROBE=1."""
    if os.environ.get("BENCH_SKIP_PROBE"):
        return
    timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", timeout_s))
    import subprocess

    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "np.asarray(jax.jit(lambda a: a + 1)(jnp.ones(8)));"
        "print(jax.devices())"
    )
    budgets = (timeout_s, 2 * timeout_s, 4 * timeout_s)
    t_start = time.perf_counter()
    for attempt, budget_s in enumerate(budgets):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=budget_s,
            )
        except subprocess.TimeoutExpired:
            if attempt < len(budgets) - 1:
                print(
                    f"bench: backend probe exceeded {budget_s}s; retrying "
                    f"with {budgets[attempt + 1]}s (congested tunnel?)",
                    file=sys.stderr,
                )
                continue
            _fail_soft(
                "backend_unreachable",
                time.perf_counter() - t_start,
                f"bench: accelerator backend unreachable (probe exceeded "
                f"{budget_s}s after {len(budgets)} attempts — tunnel/chip "
                "down?). Set BENCH_SKIP_PROBE=1 to bypass.",
            )
        if proc.returncode != 0:
            _fail_soft(
                "backend_probe_failed",
                time.perf_counter() - t_start,
                "bench: accelerator backend probe failed:\n"
                + proc.stderr[-2000:],
            )
        return


def _arm_wedge_watchdog() -> "threading.Event":
    """Arm a daemon watchdog against the tunnelled plugin's dispatch wedge.

    Observed (round 5): a process whose backend PROBE succeeds can still
    hang FOREVER on its own first substantial dispatch — every thread
    futex-parked, zero CPU accrual, the plugin reconnecting underneath
    (`axon-conn-*` threads).  A hung dispatch is uninterruptible from
    Python, so the recovery is a watchdog thread: if the first measured
    stage has not completed within BENCH_WEDGE_TIMEOUT_S (default 1500 s
    — far above the worst measured HEALTHY warmup, 653 s of r02 tunnel
    congestion, so it cannot false-trigger on slowness), emit the
    structured fail-soft record and hard-exit 0 so the driver always gets
    a parseable artifact instead of an rc!=0 timeout kill (the r3 empty-
    artifact failure mode, second edition).  Call ``.set()`` on the
    returned event once real measurements have started flowing."""
    import threading

    budget = float(os.environ.get("BENCH_WEDGE_TIMEOUT_S", "1500"))
    done = threading.Event()

    def watchdog():
        if done.wait(budget):
            return
        print(
            f"bench: first dispatch still pending after {budget:.0f}s — "
            "tunnelled-plugin dispatch wedge; emitting fail-soft record",
            file=sys.stderr, flush=True,
        )
        print(json.dumps({
            "metric": "gmst_full_experiment_7ssp_fit2000_weight_barycentre",
            "value": None,
            "unit": "s",
            "vs_baseline": None,
            "status": "dispatch_wedge",
            "probe_s": None,
            "warmup_s": None,
            "detail": (
                f"backend probe OK but the first dispatch hung >{budget:.0f}s "
                "(plugin wedge; kill + fresh process usually recovers)"
            ),
            "last_known_good": {"value": 1.216, "round": "r5-builder",
                                "driver_verified_r04": 1.204},
        }), flush=True)
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()
    return done


_probe_backend()
# Arm the watchdog ONLY in the script run: an importer (the fail-soft tests
# exec this module for its helpers) must not inherit a daemon timer that
# os._exit(0)'s the host process — under pytest that would kill the rest of
# the suite while reporting success (review finding, round 5).
_warmup_done = _arm_wedge_watchdog() if __name__ == "__main__" else None

import jax
import jax.numpy as jnp

from bayesian_ensembling_tpu import pipeline
from bayesian_ensembling_tpu.parallel.step import ensemble_multi_scenario_step

N_ITERS = int(os.environ.get("BENCH_N_ITERS", "2000"))
DBA_ITERS = int(os.environ.get("BENCH_DBA_ITERS", "10"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _min_over_reps(step_fn, reps, hb, hm, sb, sm, obs, mmask, sync, label=""):
    """Min wall-clock over ``reps`` fresh-buffer executions; returns
    ``(seconds, last_output)``.

    Fresh input buffers each rep: the tunnelled chip can dedup an execution
    on byte-identical buffers to ~0.1 ms (BASELINE.md quirks), which
    min-over-reps would then publish as the headline.  The minimum is the
    honest steady-state figure for a deterministic program on a link whose
    throughput fluctuates >2x between measurement windows (BASELINE.md).
    """
    best = float("inf")
    out = None
    for rep in range(reps):
        hb_rep = hb + 0.0
        sync(hb_rep)
        t0 = time.perf_counter()
        out = step_fn(hb_rep, hm, sb, sm, obs, mmask)
        sync(out)
        rep_s = time.perf_counter() - t0
        log(f"{label}rep {rep}: {rep_s:.3f}s")
        best = min(best, rep_s)
    return best, out


def _parity_vs_anchor(anchor, ssp_names, means, stds, anchor_path):
    """Max pointwise |dmean| / |dstd| vs the anchor's posterior records.

    An anchor file without per-scenario ``bary_mean`` records cannot gate
    anything — that is a broken artifact, not a pass, so it fails loudly
    instead of letting a "parity-gated" figure publish ungated.
    """
    mdiffs, sdiffs = [], []
    for i, ssp in enumerate(ssp_names):
        rec = anchor["scenarios"].get(ssp)
        if not rec or "bary_mean" not in rec:
            continue
        mdiffs.append(np.abs(np.asarray(means[i], np.float64)
                             - np.asarray(rec["bary_mean"])).max())
        sdiffs.append(np.abs(np.asarray(stds[i], np.float64)
                             - np.asarray(rec["bary_std"])).max())
    if not mdiffs:
        raise SystemExit(
            f"bench: anchor {anchor_path} carries no posterior records "
            "(bary_mean/bary_std per scenario) — regenerate it with "
            "posteriors; refusing to publish an ungated speedup"
        )
    return float(max(mdiffs)), float(max(sdiffs))


def main():
    log("devices:", jax.devices())
    obs_pm = pipeline.load_observations()
    obs = jnp.asarray(obs_pm.data.values, dtype=jnp.float32)

    # Merge the scenario axis into the batch: all 7 scenarios' emulations run
    # in ONE fused program through the Pallas batched-cholesky NLML path.
    *stacked, ssp_names = pipeline.load_packed_scenarios()
    hb, hm, sb, sm, mmask = (jnp.asarray(a) for a in stacked)
    log(f"padding all scenarios to M={hb.shape[1]}, R={hb.shape[2]}")

    step = jax.jit(
        functools.partial(
            ensemble_multi_scenario_step,
            n_optim_nits=N_ITERS,
            dba_iterations=DBA_ITERS,
        )
    )

    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    log(f"persistent compile cache: {_CACHE_DIR or 'disabled'}")
    t0 = time.perf_counter()
    sync(step(hb, hm, sb, sm, obs, mmask))
    warmup_s = time.perf_counter() - t0
    if _warmup_done is not None:
        _warmup_done.set()  # first dispatch completed: disarm the watchdog
    log(f"warmup (session init + compile + first run): {warmup_s:.1f}s")

    if os.environ.get("BENCH_TRACE"):
        # Device trace for TensorBoard (SURVEY SS5.1 tracing subsystem).
        from bayesian_ensembling_tpu.utils.profiling import trace

        with trace(os.environ.get("BENCH_TRACE_DIR", "/tmp/bet_trace")) as d:
            sync(step(hb, hm, sb, sm, obs, mmask))
        log(f"profiler trace written to {d}")

    reps = max(int(os.environ.get("BENCH_REPS", "3")), 1)
    elapsed, out = _min_over_reps(step, reps, hb, hm, sb, sm, obs, mmask, sync)

    bmean, bstd, _ = out
    for i, ssp in enumerate(ssp_names):
        m = np.asarray(bmean[i])
        s = np.asarray(bstd[i])
        log(f"{ssp}: 2100 warming {m[-1]:.3f} (+-2sd {m[-1]-2*s[-1]:.3f}..{m[-1]+2*s[-1]:.3f})")

    def _anchored_figure(cfg, anchor_name, label, env_flag, gate="identity"):
        """Run the SAME experiment under ``cfg`` and check it against the
        f64 CPU anchor that ran the IDENTICAL configuration
        (benchmarks/cpu_baseline.py writes them).

        ``gate="identity"`` asserts pointwise parity < 0.01 °C — right for
        branch-free fits whose f32/f64 trajectories track each other.
        ``gate="report"`` computes and reports the identity figure WITHOUT
        asserting — for branchy optimisers (bfgs accept/reject): a single
        f32-flipped acceptance forks the trajectory, so identity parity is
        fork-sensitive (measured 8.4e-3 °C, 16% from the gate) and an
        unrelated numerical change could flake it.  Such figures carry a
        closeness-to-convergence gate instead (``_quality_gate`` below).
        Returns (seconds, parity_mean, anchor_dict, outputs)."""
        anchor_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "benchmarks", anchor_name,
        )
        if not (
            os.environ.get(env_flag, "1") != "0"
            and N_ITERS == 2000  # only meaningful next to the faithful workload
            and os.path.exists(anchor_path)
        ):
            return None, None, None, None
        with open(anchor_path) as f:
            anchor = json.load(f)
        # Compare the FULL fit configuration, not just cfg's keys: the
        # anchor writer (benchmarks/cpu_baseline.py) omits default-valued
        # keys, and an anchor regenerated with e.g. a warm schedule must
        # not pass as a match for a scratch figure (it would fail the
        # parity assert after the expensive measurements instead of
        # skipping gracefully here).
        fit_defaults = {
            "n_optim_nits": None, "time_stride": 1, "fine_steps": None,
            "optimizer": "adam",
        }
        if not (
            all(
                anchor.get(k, d) == cfg.get(k, d)
                for k, d in fit_defaults.items()
            )
            and anchor.get("dba_iterations", 10) == DBA_ITERS
        ):
            log(f"{label} anchor config mismatch — skipping {label} figure")
            return None, None, None, None
        fig_step = jax.jit(
            functools.partial(
                ensemble_multi_scenario_step,
                dba_iterations=DBA_ITERS,
                **cfg,
            )
        )
        sync(fig_step(hb, hm, sb, sm, obs, mmask))  # compile + warm
        secs, fout = _min_over_reps(
            fig_step, reps, hb, hm, sb, sm, obs, mmask, sync,
            label=label + " ",
        )
        pm, ps = _parity_vs_anchor(
            anchor, ssp_names, fout[0], fout[1], anchor_path
        )
        log(
            f"{label} parity vs f64 CPU {label} anchor: max |dmean| "
            f"{pm:.5f} degC, max |dstd| {ps:.5f} degC"
            + (" (diagnostic only — quality-gated below)" if gate == "report" else "")
        )
        if gate == "identity":
            assert pm < 0.01 and ps < 0.01, (label, pm, ps)
        return secs, pm, anchor, fout

    # Second headline figure: the coarse-to-fine-in-time schedule
    # (ops/gp.fit_gp_batch_warm_time) runs the SAME experiment to
    # equal-or-better closeness to the converged optimum in ~0.3 s
    # (benchmarks/annual_warm_bench.py measured the quality claim against a
    # 10,000-step truth).  Opt out with BENCH_WARM=0.
    warm_s, warm_parity_mean, warm_cpu, _ = _anchored_figure(
        {"n_optim_nits": 1000, "time_stride": 12, "fine_steps": 250},
        "cpu_baseline_warm.json", "warm", "BENCH_WARM",
    )

    # Third headline figure: the per-model damped quasi-Newton
    # (ops/gp._build_batch_step optimizer="bfgs") converges in ~30 steps —
    # strictly better barycentre moments than the faithful scratch-2000 at
    # ~6x less wall (benchmarks/annual_warm_bench.py measured the quality
    # claim against a 10,000-step truth).  Identity parity vs the f64 bfgs
    # anchor is reported as a DIAGNOSTIC only (fork-sensitive, see
    # _anchored_figure); the PRIMARY gate is closeness-to-convergence
    # below.  Opt out with BENCH_BFGS=0.
    bfgs_s, bfgs_parity_mean, bfgs_cpu, bfgs_out = _anchored_figure(
        {"n_optim_nits": 30, "optimizer": "bfgs"},
        "cpu_baseline_bfgs.json", "bfgs", "BENCH_BFGS", gate="report",
    )

    bfgs_quality = scratch_quality = None
    if bfgs_s is not None:
        # PRIMARY bfgs gate (VERDICT r3 item 7): closeness to the CONVERGED
        # optimum, no worse than the faithful scratch-2000 run's own
        # closeness (x1.05 slack).  The truth is a 10,000-step Adam run of
        # the identical program, computed in-run — both closenesses are
        # measured against the same truth, so the gate cannot flake on an
        # accept/reject fork the way the thin identity gate can
        # (benchmarks/annual_warm_bench.py measured bfgs-30 strictly
        # better: 0.0162 vs 0.0191 degC).
        truth_iters = int(os.environ.get("BENCH_TRUTH_ITERS", "10000"))
        truth_step = jax.jit(
            functools.partial(
                ensemble_multi_scenario_step,
                n_optim_nits=truth_iters,
                dba_iterations=DBA_ITERS,
            )
        )
        tout = truth_step(hb, hm, sb, sm, obs, mmask)
        sync(tout)
        tm = np.asarray(tout[0], np.float64)
        ts = np.asarray(tout[1], np.float64)

        def closeness(out_):
            return max(
                float(np.abs(np.asarray(out_[0], np.float64) - tm).max()),
                float(np.abs(np.asarray(out_[1], np.float64) - ts).max()),
            )

        bfgs_quality = closeness(bfgs_out)
        scratch_quality = closeness((bmean, bstd))
        log(
            f"closeness to converged truth ({truth_iters}-step): "
            f"bfgs-30 {bfgs_quality:.4f} degC vs scratch-2000 "
            f"{scratch_quality:.4f} degC"
        )
        assert bfgs_quality <= scratch_quality * 1.05, (
            f"bfgs quality gate: {bfgs_quality} vs scratch "
            f"{scratch_quality} (x1.05)"
        )

    def _matched_hparams_stage():
        """BASELINE.json's 1e-5 line on the real workload (VERDICT r3 #4).

        Export the TPU run's converged hyperparameters (and f32 DBA
        targets), recompute the posterior→weights→barycentre pipeline in
        f64 on CPU (benchmarks/matched_hparams_oracle.py subprocess), and
        gate pointwise.  Two figures: ``matched_targets`` (pure
        linear-algebra/tail computation parity, gated at 1e-5) and
        ``matched_hparams`` (adds the f64 re-run of the branchy DTW DP,
        whose near-tie path flips are real algorithm sensitivity, not
        computation error — gated at its own measured envelope).
        Opt out with BENCH_MATCHED=0.
        """
        if os.environ.get("BENCH_MATCHED", "1") == "0" or N_ITERS != 2000:
            return None, None, None
        import subprocess
        import tempfile

        from bayesian_ensembling_tpu.ops.gp import prepare_gp_inputs
        from bayesian_ensembling_tpu.parallel.step import (
            emulate_marginals,
            multi_scenario_tail,
        )

        s, m, r, t_hist = hb.shape
        t_ssp = sb.shape[-1]
        em = jax.jit(
            functools.partial(
                emulate_marginals,
                n_optim_nits=N_ITERS,
                dba_iterations=DBA_ITERS,
                return_params=True,
            )
        )
        prep = jax.jit(
            functools.partial(prepare_gp_inputs, dba_iterations=DBA_ITERS)
        )
        hbf, hmf = hb.reshape(s * m, r, t_hist), hm.reshape(s * m, r)
        sbf, smf = sb.reshape(s * m, r, t_ssp), sm.reshape(s * m, r)
        h_mu, h_var, hp = em(hbf, hmf)
        s_mu, s_var, sp = em(sbf, smf)
        _, h_ym, h_yv = prep(hbf, hmf)
        _, s_ym, s_yv = prep(sbf, smf)
        t_bm, t_bs, _ = jax.jit(multi_scenario_tail)(
            h_mu.reshape(s, m, t_hist), h_var.reshape(s, m, t_hist),
            s_mu.reshape(s, m, t_ssp), s_var.reshape(s, m, t_ssp),
            obs, hb, hm, mmask,
        )
        with tempfile.TemporaryDirectory() as td:
            inp, outp = os.path.join(td, "in.npz"), os.path.join(td, "out.npz")
            np.savez(
                inp,
                hb=np.asarray(hb), hm=np.asarray(hm),
                sb=np.asarray(sb), sm=np.asarray(sm),
                obs=np.asarray(obs), mmask=np.asarray(mmask),
                dba_iterations=DBA_ITERS,
                hist_raw_lengthscale=np.asarray(hp.raw_lengthscale),
                hist_raw_variance=np.asarray(hp.raw_variance),
                ssp_raw_lengthscale=np.asarray(sp.raw_lengthscale),
                ssp_raw_variance=np.asarray(sp.raw_variance),
                hist_y_mean=np.asarray(h_ym), hist_y_var=np.asarray(h_yv),
                ssp_y_mean=np.asarray(s_ym), ssp_y_var=np.asarray(s_yv),
            )
            oracle = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "benchmarks", "matched_hparams_oracle.py",
            )
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            proc = subprocess.run(
                [sys.executable, oracle, inp, outp],
                capture_output=True, text=True, timeout=1800, env=env,
            )
            if proc.returncode != 0:
                raise SystemExit(
                    "matched-hparams oracle failed:\n" + proc.stderr[-2000:]
                )
            z = np.load(outp)
            tb_m = np.asarray(t_bm, np.float64)
            tb_s = np.asarray(t_bs, np.float64)
            tgt = max(
                float(np.abs(tb_m - z["targets_bary_mean"]).max()),
                float(np.abs(tb_s - z["targets_bary_std"]).max()),
            )
            hpr = max(
                float(np.abs(tb_m - z["hparams_bary_mean"]).max()),
                float(np.abs(tb_s - z["hparams_bary_std"]).max()),
            )
            # f64 refinement ON THE TPU at the same f32 hyperparameters
            # and targets: removes the f32 solve-scatter floor from the
            # published moments (parallel/step.refined_multi_scenario_f64)
            # and must match the f64 CPU oracle at BASELINE.json's 1e-5.
            from bayesian_ensembling_tpu.parallel.step import (
                refined_multi_scenario_f64,
            )

            t_ref = time.perf_counter()
            rbm, rbs, _ = refined_multi_scenario_f64(
                hb, hm, sb, sm, obs, mmask, hp, sp,
                dba_iterations=DBA_ITERS,
                targets=((h_ym, h_yv), (s_ym, s_yv)),
            )
            refine_s = time.perf_counter() - t_ref
            refined = max(
                float(np.abs(rbm - z["targets_bary_mean"]).max()),
                float(np.abs(rbs - z["targets_bary_std"]).max()),
            )
        log(
            f"matched-hyperparameter parity vs f64 CPU recompute: "
            f"targets-matched {tgt:.2e}, dba-recomputed {hpr:.2e}, "
            f"f64-refined {refined:.2e} (refine {refine_s:.1f}s incl. "
            f"compile)"
        )
        # Measured floor ~2.3e-4 degC: at the REAL workload's converged
        # hyperparameters (long lengthscales -> ill-conditioned grams) the
        # f32 solve error is kappa(K)*eps_f32 ~ 1e-4..1e-3 — the SAME
        # magnitude as the headline trajectory-parity figure, i.e. the
        # workload's f32 computation-precision floor, not trajectory
        # divergence (BASELINE.md "Matched-hyperparameter parity").  The
        # 1e-5 level holds where conditioning permits (synthetic gridded
        # 5e-6; f64-vs-f64 exact).  Gate at 1e-3 (4x margin on measured).
        tol_t = float(os.environ.get("BENCH_MATCHED_TOL", "1e-3"))
        assert tgt < tol_t, (
            f"matched-targets computation parity {tgt} >= {tol_t}"
        )
        # The refined moments carry no f32 solve scatter: BASELINE.json's
        # 1e-5 line, gated on the real workload (SystemExit survives -O).
        tol_r = float(os.environ.get("BENCH_REFINED_TOL", "1e-5"))
        if refined >= tol_r:
            raise SystemExit(
                f"f64-refined matched parity {refined} >= {tol_r}"
            )
        return tgt, hpr, refined

    matched_targets, matched_hparams, matched_refined = (
        _matched_hparams_stage()
    )

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "cpu_baseline.json")
    vs = None
    parity_mean = None
    parity_std = None
    # Pointwise posterior-moment parity gate vs the float64 CPU anchor
    # (BASELINE.json: the speedup must not change answers).  f32 tolerance
    # rationale (BASELINE.md): 2000 independent f32-vs-f64 Adam trajectories
    # agree to ~1e-3 degC pointwise on these workloads; 1e-5 would require
    # f64 accumulation on-chip.  Gate set at 3x the observed worst case.
    MEAN_TOL = float(os.environ.get("BENCH_PARITY_MEAN_TOL", "0.01"))
    STD_TOL = float(os.environ.get("BENCH_PARITY_STD_TOL", "0.01"))
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            cpu = json.load(f)
        # Comparable only when BOTH workload knobs match the anchor's
        # (the anchor ran run_scenario's default of 10 DBA iterations).
        if (
            cpu.get("n_optim_nits") == N_ITERS
            and cpu.get("dba_iterations", 10) == DBA_ITERS
        ):
            vs = cpu["total_seconds"] / elapsed
            parity_mean, parity_std = _parity_vs_anchor(
                cpu, ssp_names, bmean, bstd, baseline_path
            )
            log(
                f"parity vs CPU float64 anchor (pointwise, all scenarios): "
                f"max |dmean| {parity_mean:.5f} degC, max |dstd| {parity_std:.5f} degC"
            )
            assert parity_mean < MEAN_TOL, (
                f"posterior mean divergence {parity_mean:.5f} degC >= {MEAN_TOL}"
            )
            assert parity_std < STD_TOL, (
                f"posterior std divergence {parity_std:.5f} degC >= {STD_TOL}"
            )

    print(json.dumps({
        "metric": "gmst_full_experiment_7ssp_fit2000_weight_barycentre",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs else None,
        "warmup_s": round(warmup_s, 1),
        "reps": reps,
        "compile_cache": bool(_CACHE_DIR),
        "parity_pointwise_mean_degC": round(parity_mean, 6) if parity_mean is not None else None,
        "parity_pointwise_std_degC": round(parity_std, 6) if parity_std is not None else None,
        # Warm-in-time schedule (same experiment, equal-or-better
        # convergence — BASELINE.md "Warm-in-time at ANNUAL resolution"):
        # wall seconds, speedup vs the f64 CPU anchor running the IDENTICAL
        # warm schedule (75.3 s), and vs the scratch-2000 CPU anchor (the
        # reference workload's configuration, 387.9 s).
        "warm_s": round(warm_s, 3) if warm_s is not None else None,
        "warm_vs_cpu_warm_anchor": (
            round(warm_cpu["total_seconds"] / warm_s, 2)
            if warm_s is not None else None
        ),
        "warm_vs_scratch_anchor": (
            round(cpu["total_seconds"] / warm_s, 2)
            if warm_s is not None and vs is not None else None
        ),
        "warm_parity_pointwise_mean_degC": (
            round(warm_parity_mean, 6) if warm_parity_mean is not None else None
        ),
        # Per-model damped quasi-Newton (optimizer="bfgs", ~30 steps):
        # strictly better converged moments than scratch-2000 at ~6x less
        # wall (BASELINE.md "Fewer-steps route, revisited"); speedups vs
        # the f64 CPU anchor running the IDENTICAL bfgs fit and vs the
        # scratch-2000 CPU anchor.
        "bfgs_s": round(bfgs_s, 3) if bfgs_s is not None else None,
        "bfgs_vs_cpu_bfgs_anchor": (
            round(bfgs_cpu["total_seconds"] / bfgs_s, 2)
            if bfgs_s is not None else None
        ),
        "bfgs_vs_scratch_anchor": (
            round(cpu["total_seconds"] / bfgs_s, 2)
            if bfgs_s is not None and vs is not None else None
        ),
        "bfgs_parity_pointwise_mean_degC": (
            round(bfgs_parity_mean, 6) if bfgs_parity_mean is not None else None
        ),
        # PRIMARY bfgs gate: closeness to the in-run 10,000-step converged
        # truth, vs the scratch-2000 run's own closeness (identity parity
        # above is diagnostic only — fork-sensitive).
        "bfgs_quality_vs_truth_degC": (
            round(bfgs_quality, 5) if bfgs_quality is not None else None
        ),
        "scratch_quality_vs_truth_degC": (
            round(scratch_quality, 5) if scratch_quality is not None else None
        ),
        # Matched-hyperparameter computation parity (BASELINE.json's 1e-5
        # line on the real workload): the TPU run's converged
        # hyperparameters (+ f32 DBA targets for the "targets" figure)
        # recomputed through the f64 CPU pipeline, compared pointwise.
        "parity_matched_targets": (
            float(f"{matched_targets:.3e}") if matched_targets is not None else None
        ),
        "parity_matched_hparams": (
            float(f"{matched_hparams:.3e}") if matched_hparams is not None else None
        ),
        "parity_matched_refined": (
            float(f"{matched_refined:.3e}") if matched_refined is not None else None
        ),
    }))


if __name__ == "__main__":
    main()
