"""Gridded experiment benchmark (the BASELINE.md north-star configuration).

Synthetic CMIP6-vs-HadCRUT5-scale gridded workload: M climate models on a
global lat/lon grid, per-cell DBA + heteroskedastic GP emulation (GPDTW3D
batched mode), per-cell CRPS weighting against gridded observations, and the
per-cell W2 barycentre.  The bundled reference data is GMST-only (already
area-averaged), so the workload is synthetic but dimensioned like the real
thing: 5 models x 72x36 grid (5 deg) x 10 realisations x 86 annual steps
= 12,960 independent GP fits.

North star: full gridded fit + ensemble < 60 s on a v5e-8 slice.  This bench
runs single-chip; the pipeline shards over cells with zero collectives
(parallel/gridded.py), so the v5e-8 estimate is ~1/8 of the single-chip time.

Parity gate: if ``gridded_oracle.json`` exists (CPU float64 oracle over the
first N cells, see gridded_oracle.py), the f32 posterior moments must agree
pointwise on those cells (VERDICT r1 item 1: the gridded path previously had
no oracle).

Usage: python benchmarks/gridded_bench.py [n_optim_nits] [lat] [lon] [slab]
           [--warm-stride S] [--fine-nits F]

``--warm-stride S`` enables the coarse-to-fine warm start (VERDICT r2
item 3): every S-th row/column is fit from scratch at the full step count,
every cell is then initialised from its nearest coarse neighbour and run
for ``--fine-nits`` steps (default n_optim_nits/5).  The parity gate
compares only against an oracle generated with the SAME warm configuration
(gridded_oracle.py takes the same flags).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import gridded_common as gc

# Measured f32-vs-f64 pointwise divergence on this workload is ~5e-6 (the
# well-conditioned synthetic fits converge to the same optimum), so the gate
# sits at 1e-3 with >100x margin.
MEAN_TOL = float(os.environ.get("BENCH_PARITY_MEAN_TOL", "1e-3"))
STD_TOL = float(os.environ.get("BENCH_PARITY_STD_TOL", "1e-3"))

# --gate quality reference configurations (both f64 CPU, gridded_oracle.json):
# the converged-truth entry and the production scratch baseline whose
# closeness the gated run must match or beat.
QUALITY_TRUTH_NITS = int(os.environ.get("BENCH_QUALITY_TRUTH_NITS", "2000"))
QUALITY_BASELINE_NITS = int(os.environ.get("BENCH_QUALITY_BASELINE_NITS", "500"))


def select_oracle_entry(loaded, *, n_iters, n_cells, warm_stride, fine_nits, lat, lon,
                        optimizer="adam"):
    """Pick the oracle entry matching this run's configuration, or None.

    The warm oracle file holds one entry per configuration (``{"entries":
    [...]}``, one per fine step count etc.); the non-warm file and legacy
    warm files are a single bare entry.  Entries written before the
    ``--optimizer`` flag existed are Adam runs (the only optimizer then).
    """
    entries = loaded["entries"] if "entries" in loaded else [loaded]
    return next(
        (
            o
            for o in entries
            if o.get("n_optim_nits") == n_iters
            and o["n_cells"] <= n_cells
            and o.get("warm_stride", 0) == warm_stride
            and o.get("optimizer", "adam") == optimizer
            and (not warm_stride or o.get("fine_nits") == fine_nits)
            and (not warm_stride or (o.get("lat"), o.get("lon")) == (lat, lon))
        ),
        None,
    )


def quality_gate_check(loaded, bary_mean, bary_std, *, n_cells, lat, lon):
    """Closeness-to-converged-truth gate (``--gate quality``).

    The run's first-N-cell moments must sit at least as close to the f64
    adam-``QUALITY_TRUTH_NITS`` converged oracle as the f64
    scratch-``QUALITY_BASELINE_NITS`` production config's own moments do —
    the ``warm_quality.py`` acceptability criterion, evaluated in-bench on
    the oracle subset.  Both reference entries live in
    ``gridded_oracle.json``; regenerate with::

        python benchmarks/gridded_oracle.py 2000 64
        python benchmarks/gridded_oracle.py 500 64

    Returns ``(quality_mean, quality_std)`` (the run's max pointwise
    distances to the truth entry); raises on a gate failure or missing
    reference entries.
    """
    truth = select_oracle_entry(
        loaded, n_iters=QUALITY_TRUTH_NITS, n_cells=n_cells,
        warm_stride=0, fine_nits=None, lat=lat, lon=lon, optimizer="adam",
    )
    baseline = select_oracle_entry(
        loaded, n_iters=QUALITY_BASELINE_NITS, n_cells=n_cells,
        warm_stride=0, fine_nits=None, lat=lat, lon=lon, optimizer="adam",
    )
    if truth is None or baseline is None:
        # Distinguish "entry absent" from "entry present but its oracle
        # subset exceeds this run's grid" (select_oracle_entry requires
        # n_cells <= the run's cells, so a 32-cell smoke run cannot use
        # 64-cell entries) — ADVICE r3.
        entries = loaded["entries"] if "entries" in loaded else [loaded]
        any_bigger = any(
            o.get("n_optim_nits") in (QUALITY_TRUTH_NITS, QUALITY_BASELINE_NITS)
            and o.get("warm_stride", 0) == 0
            and o.get("optimizer", "adam") == "adam"
            and o["n_cells"] > n_cells
            for o in entries
        )
        hint = (
            f" (entries exist but their oracle subsets exceed this run's "
            f"{n_cells} cells — oracle entries must not exceed the run's "
            f"cell count; regenerate with n_cells <= {n_cells})"
            if any_bigger else ""
        )
        raise SystemExit(
            "--gate quality needs adam oracle entries at "
            f"{QUALITY_TRUTH_NITS} (truth) and {QUALITY_BASELINE_NITS} "
            f"(baseline) steps in gridded_oracle.json{hint}"
        )
    nc = min(truth["n_cells"], baseline["n_cells"])
    tm = np.asarray(truth["bary_mean"])[:nc]
    ts = np.asarray(truth["bary_std"])[:nc]
    quality_mean = float(np.abs(bary_mean[:nc] - tm).max())
    quality_std = float(np.abs(bary_std[:nc] - ts).max())
    base_mean = float(np.abs(np.asarray(baseline["bary_mean"])[:nc] - tm).max())
    base_std = float(np.abs(np.asarray(baseline["bary_std"])[:nc] - ts).max())
    print(
        f"gridded quality vs f64 converged truth ({nc} cells): "
        f"max |dmean| {quality_mean:.5f} (scratch-{QUALITY_BASELINE_NITS}"
        f" baseline {base_mean:.5f}), max |dstd| {quality_std:.5f} "
        f"(baseline {base_std:.5f})",
        file=sys.stderr,
    )
    # SystemExit (not assert) so the gate survives `python -O`, and a small
    # relative slack so a config sitting exactly at baseline quality cannot
    # flap across jax/compiler versions from f32 scatter alone (ADVICE r3).
    slack = 1.0 + float(os.environ.get("BENCH_QUALITY_SLACK", "0.02"))
    if quality_mean > base_mean * slack:
        raise SystemExit(
            f"quality gate: mean {quality_mean} vs scratch baseline "
            f"{base_mean} (x{slack:.2f} slack)"
        )
    if quality_std > base_std * slack:
        raise SystemExit(
            f"quality gate: std {quality_std} vs scratch baseline "
            f"{base_std} (x{slack:.2f} slack)"
        )
    return quality_mean, quality_std


def slabbed_run(step, block, obs, slab, *, gp_init=None, resident=False,
                block_dev=None, obs_dev=None, collect_fit=False,
                stream=False, progress=False):
    """Drive ``step`` over cell slabs with one-deep pipelined dispatch.

    Device transfers and jitted computes are async, so enqueueing slab
    i+1's work BEFORE fetching slab i's output overlaps the (tunnel-bound)
    host->device copy — or, under ``resident``, the on-device slice — with
    the previous slab's on-chip compute.  Identical numerics either way;
    the only change is dispatch order and where the slab slices are taken:

    * default: slice the HOST arrays and stream each slab through the link;
    * ``resident``: slice the staged HBM copies (``block_dev``/``obs_dev``)
      with an on-device XLA slice/concat per slab — no link traffic;
    * ``stream``: double-buffered host->HBM staging on a background
      thread — slab k+1's host slice (possibly a disk-backed memmap read)
      AND its device transfer complete while slab k computes, with a
      depth-1 queue bounding HBM to one computing + one staged slab.
      This is the mode for grids whose INPUTS exceed HBM (0.25°: ~21 GB
      vs the 16 GB chip), where ``resident`` staging is impossible; the
      numpy slice, ``device_put`` DMA, and disk IO all release the GIL,
      so the single-CPU host genuinely overlaps them with TPU compute.

    ``step`` is called as ``step(block_slab, obs_slab)`` or, when
    ``gp_init`` is given, ``step(block_slab, obs_slab, gp_init_slab)`` and
    must return ``(mean, std, ...)`` with the cell axis leading.  The
    ragged final slab is padded with leading cells so every dispatch
    reuses one compiled program, and the pad is sliced off on drain.

    ``collect_fit``: the step returns ``(mean, std, w, params, y_mean,
    y_var)`` (``return_fit=True``) and the drain additionally gathers the
    per-slab fit products — the f64 refinement's inputs (``--refine-f64``);
    returns ``(mean, std, params, y_mean, y_var)``.
    """
    import jax
    import jax.numpy as jnp

    if resident:
        assert block_dev is not None and obs_dev is not None
    if resident and stream:
        raise ValueError("stream and resident staging are mutually exclusive")
    bsrc = block_dev if resident else block
    osrc = obs_dev if resident else obs
    cat = jnp.concatenate if resident else np.concatenate
    c = block.shape[1]
    if slab > c:
        # The ragged-slab pad wraps cells from the array head; a slab larger
        # than the grid would need pad > c and silently truncate.  Callers
        # with slab >= c want the unslabbed whole-grid path instead.
        raise ValueError(f"slab ({slab}) must be <= the cell count ({c})")
    if resident and gp_init is not None:
        # Stage the warm-start tree too, so the per-slab slices below are
        # on-device like the block/obs slices (otherwise the tree streams
        # through the link inside the timed loop, which is exactly what
        # resident mode exists to exclude).
        gp_init = jax.device_put(gp_init)

    pending = []  # (out, pad) one slab deep
    means, stds = [], []
    fit_parts = []  # (params, y_mean, y_var) per slab, cell axis = 1

    n_slabs = -(-c // slab) if slab else 1

    def drain(entry):
        out, pad_ = entry
        m_ = np.asarray(out[0], np.float64)
        s_ = np.asarray(out[1], np.float64)
        if pad_:
            m_, s_ = m_[:-pad_], s_[:-pad_]
        means.append(m_)
        stds.append(s_)
        if progress:
            print(
                f"  slab {len(means)}/{n_slabs} done",
                file=sys.stderr, flush=True,
            )
        if collect_fit:
            p_ = jax.tree.map(np.asarray, out[3])
            ym_, yv_ = np.asarray(out[4]), np.asarray(out[5])
            if pad_:
                p_ = jax.tree.map(lambda a: a[:, :-pad_], p_)
                ym_, yv_ = ym_[:, :-pad_], yv_[:, :-pad_]
            fit_parts.append((p_, ym_, yv_))

    def slice_cells(lo_, hi, pad):
        bsl = bsrc[:, lo_:hi]
        osl = osrc[lo_:hi]
        gsl = (
            jax.tree.map(lambda p: p[:, lo_:hi], gp_init)
            if gp_init is not None
            else None
        )
        if pad:  # pad the ragged final slab to reuse the XLA program
            bsl = cat([bsl, bsrc[:, :pad]], axis=1)
            osl = cat([osl, osrc[:pad]], axis=0)
            if gsl is not None:
                gsl = jax.tree.map(
                    lambda p, q: cat([p, q[:, :pad]], axis=1),
                    gsl,
                    gp_init,
                )
        return bsl, osl, gsl

    def staged_slabs():
        """Yield (b_dev, o_dev, gsl, pad) per slab, transfers staged."""
        if not stream:
            for lo_ in range(0, c, slab):
                hi = min(lo_ + slab, c)
                pad = slab - (hi - lo_) if hi - lo_ < slab else 0
                bsl, osl, gsl = slice_cells(lo_, hi, pad)
                if resident:
                    yield bsl, osl, gsl, pad
                else:
                    yield (
                        jax.device_put(np.ascontiguousarray(bsl)),
                        jax.device_put(np.ascontiguousarray(osl)),
                        gsl,
                        pad,
                    )
            return
        import queue

        q = queue.Queue(maxsize=1)

        def put(item) -> bool:
            """Timed put so a consumer abandonment (exception in step/
            drain) unparks the producer: a plain q.put on the full queue
            would otherwise block forever, pinning the staged slab's HBM
            buffers for the process lifetime (review finding, round 5)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for lo_ in range(0, c, slab):
                    hi = min(lo_ + slab, c)
                    pad = slab - (hi - lo_) if hi - lo_ < slab else 0
                    bsl, osl, gsl = slice_cells(lo_, hi, pad)
                    b_dev = jax.device_put(np.ascontiguousarray(bsl))
                    o_dev = jax.device_put(np.ascontiguousarray(osl))
                    # Block IN THE PRODUCER so the queue depth bounds HBM
                    # to one computing + one fully-staged slab, and the
                    # main thread never waits on an in-flight transfer.
                    jax.block_until_ready((b_dev, o_dev))
                    if not put((b_dev, o_dev, gsl, pad)):
                        return
                put(None)
            except BaseException as e:  # surface staging failures loudly
                put(e)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    stop = None
    if stream:
        import threading

        stop = threading.Event()
    try:
        for b_dev, o_dev, gsl, pad in staged_slabs():
            out = step(b_dev, o_dev, gsl) if gp_init is not None else step(b_dev, o_dev)
            pending.append((out, pad))
            if len(pending) > 1:
                drain(pending.pop(0))
        for entry in pending:
            drain(entry)
    finally:
        if stop is not None:
            stop.set()
    if collect_fit:
        params = jax.tree.map(
            lambda *leaves: np.concatenate(leaves, axis=1),
            *[p for p, _, _ in fit_parts],
        )
        ym = np.concatenate([y for _, y, _ in fit_parts], axis=1)
        yv = np.concatenate([y for _, _, y in fit_parts], axis=1)
        return np.concatenate(means), np.concatenate(stds), params, ym, yv
    return np.concatenate(means), np.concatenate(stds)


def run_refine(args, block, obs, fit, bary_mean_f32, bary_std_f32, *,
               slab, c, m, r):
    """The ``--refine-f64`` final-artifact pass + matched-oracle gate.

    Refines the WHOLE grid's moments in float64 at the run's f32-converged
    hyperparameters/targets (parallel/gridded.refined_gridded_f64), then
    gates the refined moments against an independent f64 CPU recompute at
    the SAME params/targets (gridded_matched_oracle.py subprocess) on the
    first-64-cell subset — a pure computation-parity statement (expect
    ~1e-12; SystemExit at BENCH_REFINED_MATCHED_TOL, default 1e-5).
    Returns ``(refined_mean, refined_std, refine_s, parity)``.
    """
    import subprocess
    import tempfile

    import jax

    from bayesian_ensembling_tpu.parallel.gridded import refined_gridded_f64

    params, ym, yv = fit
    mask = np.ones((m, c, r), bool)
    device = None if args.refine_device == "default" else args.refine_device
    chunk = args.refine_cell_chunk or (
        slab if slab and slab < c else min(c, 5400)
    )
    t0 = time.perf_counter()
    rbm, rbs, _ = refined_gridded_f64(
        block, obs, mask, params, (ym, yv), device=device, cell_chunk=chunk
    )
    refine_s = time.perf_counter() - t0
    drift = max(
        float(np.abs(rbm - bary_mean_f32).max()),
        float(np.abs(rbs - bary_std_f32).max()),
    )
    print(
        f"f64 refine ({args.refine_device}, chunk {chunk}): {refine_s:.1f}s, "
        f"f32->f64 moment drift {drift:.2e} (the solve scatter removed)",
        file=sys.stderr,
    )

    nc = min(c, 64)
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.npz")
        outp = os.path.join(td, "out.npz")
        np.savez(
            inp,
            block=block[:, :nc], obs=obs[:nc], mask=mask[:, :nc],
            raw_lengthscale=np.asarray(params.raw_lengthscale)[:, :nc],
            raw_variance=np.asarray(params.raw_variance)[:, :nc],
            y_mean=ym[:, :nc], y_var=yv[:, :nc],
            kernel_name="matern32", jitter=1e-6,
            weight_kind="crps", sigma_mode="w2",
        )
        oracle = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "gridded_matched_oracle.py",
        )
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, oracle, inp, outp],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        if proc.returncode != 0:
            raise SystemExit(
                "gridded matched oracle failed:\n" + proc.stderr[-2000:]
            )
        z = np.load(outp)
        parity = max(
            float(np.abs(rbm[:nc] - z["bary_mean"]).max()),
            float(np.abs(rbs[:nc] - z["bary_std"]).max()),
        )
    tol = float(os.environ.get("BENCH_REFINED_MATCHED_TOL", "1e-5"))
    print(
        f"refined matched-hyperparameter parity vs f64 CPU oracle "
        f"({nc} cells): {parity:.2e} (gate {tol:g})",
        file=sys.stderr,
    )
    if parity >= tol:
        raise SystemExit(
            f"refined matched parity {parity} >= {tol} — the f64 "
            "refinement and an independent f64 recompute at the same "
            "hyperparameters disagree"
        )
    return rbm, rbs, refine_s, parity


def check_identity_gate_ran(
    profile, oracle_path, *, opt, n_iters, warm_stride, fine_nits, lat, lon
):
    """Handle an identity gate that found no matching oracle entry.

    A requested gate that silently never ran would let a parity regression
    pass as a success JSON with null parity fields.  The fast profile
    PROMISES a gated run, so it hard-fails (SystemExit, surviving
    ``python -O``); other runs (smoke grids at unanchored configs) get a
    loud stderr note with the regeneration command.
    """
    hint = (
        f"generate the matching f64 oracle entry with `python "
        f"benchmarks/gridded_oracle.py {n_iters} 64"
        + (f" --warm-stride {warm_stride} --fine-nits {fine_nits}"
           f" --lat {lat} --lon {lon}" if warm_stride else "")
        + (f" --optimizer {opt}" if opt != "adam" else "")
        + "`"
    )
    if profile == "fast":
        raise SystemExit(
            "--profile fast requires the identity gate to run, but no "
            f"oracle entry matches (optimizer={opt}, n_iters={n_iters}, "
            f"warm_stride={warm_stride}) in {oracle_path}; " + hint
        )
    print(
        f"identity gate SKIPPED: no matching oracle entry "
        f"(optimizer={opt}, n_iters={n_iters}) — {hint}",
        file=sys.stderr,
    )


def main():
    import jax
    import jax.numpy as jnp

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("n_iters", nargs="?", type=int, default=500)
    ap.add_argument("lat", nargs="?", type=int, default=36)
    ap.add_argument("lon", nargs="?", type=int, default=72)
    # Grids beyond HBM (the GP gram stat alone is C*M*T^2*4 bytes) process in
    # cell slabs through one compiled program; 0 = whole grid at once.
    ap.add_argument("slab", nargs="?", type=int, default=0)
    ap.add_argument("--warm-stride", type=int, default=0,
                    help="coarse-to-fine warm start stride (0 = off)")
    ap.add_argument("--fine-nits", type=int, default=0,
                    help="fine-pass steps under --warm-stride "
                    "(default n_iters/5)")
    ap.add_argument("--best-of", type=int, default=1,
                    help="timed repetitions; report the minimum (the "
                    "tunnelled link's throughput fluctuates and the slab "
                    "mode is transfer-bound at the margins)")
    ap.add_argument("--stream", action="store_true",
                    help="double-buffered host->HBM slab staging on a "
                    "background thread: slab k+1's host slice (memmap disk "
                    "read included) and device transfer complete while "
                    "slab k computes.  THE mode for grids whose inputs "
                    "exceed HBM (0.25-degree: ~21 GB vs 16 GB), where "
                    "--resident cannot stage the block at all.  Reports "
                    "the measured per-slab compute floor and the overlap "
                    "efficiency (floor / elapsed).  Requires a slab size.")
    ap.add_argument("--warmup-slabs", type=int, default=0,
                    help="warm up (compile + cache) on only the first N "
                    "slabs instead of a full extra pass over the grid — "
                    "at 0.25 degree a full warmup pass costs ~10 minutes "
                    "of chip+link time for nothing but the one compile")
    ap.add_argument("--progress", action="store_true",
                    help="print per-slab progress (stream/slab modes) so "
                    "long runs are observable and stalls are localisable")
    ap.add_argument("--cached-workload", action="store_true",
                    help="materialise the synthetic workload once into "
                    "memory-mapped .npy files under "
                    "benchmarks/.workload_cache/ (bit-identical to the "
                    "in-RAM generator, equality-tested) — at 0.25 degree "
                    "the ~21 GB/11-minute generation would otherwise "
                    "dominate every run; slabs then stream straight off "
                    "the memmap")
    ap.add_argument("--resident", action="store_true",
                    help="stage the full input block into HBM once (it fits; "
                    "only the per-slab GP intermediates do not) and slice "
                    "slabs on-device — measures the data-resident compute "
                    "floor of the slab mode with the one-off host->device "
                    "staging reported separately as h2d_s.  Identical "
                    "numerics and oracle; the default streams slabs from "
                    "host, which includes the tunnelled link in the timing.")
    ap.add_argument("--gate", choices=("identity", "quality"),
                    default="identity",
                    help="parity gate: 'identity' asserts pointwise "
                    "agreement with an f64 oracle running the IDENTICAL "
                    "algorithm (the default; right for branch-free fits, "
                    "whose f32/f64 trajectories track to ~1e-5).  "
                    "'quality' asserts closeness to the f64 CONVERGED "
                    "truth (adam-2000 oracle entry) no worse than the "
                    "scratch-500 production config's own closeness — the "
                    "right gate for few-step branchy optimiser configs "
                    "(warm-started bfgs), whose accept/reject branches "
                    "freeze f32-vs-f64 init scatter into the endpoint "
                    "(~2e-3) without it being an error in either run.  "
                    "Identity parity is still computed and reported when "
                    "a matching oracle entry exists.")
    ap.add_argument(
        "--refine-f64", action="store_true",
        help="publish f64-refined moments (fit stays f32; the posterior "
        "solves + weighting/barycentre tail re-run in float64 at the "
        "converged hyperparameters and f32 DBA targets — removes the f32 "
        "solve scatter, the last scatter the gridded artifacts carried).  "
        "Adds a matched-hyperparameter oracle gate: the refined moments "
        "must agree with an independent f64 CPU recompute at the SAME "
        "params/targets to 1e-5 (expect ~1e-12).  The refinement itself "
        "is an untimed final-artifact pass, reported as refine_s.",
    )
    ap.add_argument(
        "--refine-device", default="cpu",
        help="device for the f64 refinement pass: 'cpu' (default — native "
        "host f64, measured ~4x faster than TPU-emulated f64 on the "
        "annual workload) or 'default' for the accelerator (emulated but "
        "exact f64 on TPU)",
    )
    ap.add_argument(
        "--refine-cell-chunk", type=int, default=0,
        help="cells per f64 refinement chunk (bounds the f64 working set; "
        "0 = the slab size, or min(cells, 5400) whole-grid)",
    )
    from bayesian_ensembling_tpu.utils.cli import add_optimizer_arg

    add_optimizer_arg(ap)
    ap.add_argument(
        "--profile", choices=("faithful", "fast"), default="faithful",
        help="'fast' = the measured-best gridded schedule in one switch: "
        "bfgs-30 fits (utils/profiles.py), data-resident slab staging, and "
        "the identity gate against the f64 oracle running the IDENTICAL "
        "30-step fit (the gate the published gridded bfgs rows use; the "
        "closeness-to-truth comparison was SETTLED on the full 2,592-cell "
        "grid in round 5 — bfgs-30 is a consistent ~5%% worse than "
        "scratch-500 at ~5x less steady wall, and 64-cell subsets cannot "
        "resolve that margin: bootstrap ratio 0.91-1.20, "
        "benchmarks/bfgs_quality_settle.py / BASELINE.md).  "
        "Mutually exclusive with setting n_iters/--optimizer/--resident "
        "yourself.",
    )
    args = ap.parse_args()
    if args.profile == "fast":
        from bayesian_ensembling_tpu.utils.profiles import resolve_profile

        if (args.optimizer, args.n_iters) != ("adam", 500) or args.resident:
            ap.error(
                "--profile fast sets the optimizer/step count/resident "
                "itself; drop the explicit flags or use --profile faithful"
            )
        if args.gate != "identity":
            # The profile OWNS the gate too: the quality gate is
            # subset-sensitive for bfgs at the +-10% level (BASELINE.md)
            # and would spuriously fail a healthy bfgs-30 run.
            ap.error(
                "--profile fast gates with the bfgs-30 identity oracle; "
                "drop --gate or use --profile faithful"
            )
        kw = resolve_profile("fast", gridded=True)
        args.optimizer = kw["optimizer"]
        args.n_iters = kw["n_optim_nits"]
        # Resident staging only has a slab mode; --stream keeps its own
        # staging (it exists exactly for grids resident cannot hold).
        args.resident = bool(args.slab) and not args.stream
    n_iters, la, lo, slab = args.n_iters, args.lat, args.lon, args.slab
    if args.stream and not args.slab:
        ap.error("--stream is a slab mode; pass a slab size")
    if args.stream and args.resident:
        ap.error("--stream and --resident are mutually exclusive stagings")
    warm_stride = args.warm_stride
    fine_nits = args.fine_nits or max(n_iters // 5, 50)
    c = la * lo
    m, r, t = gc.M, gc.R, gc.T
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(
        f"workload: {m} models x {c} cells x {r} realisations x {t} steps "
        f"= {m * c} GP fits, {n_iters} optimisation iterations",
        file=sys.stderr,
    )

    if args.cached_workload:
        t0 = time.perf_counter()
        block, obs = gc.make_workload_cached(c)
        print(
            f"workload cache ready in {time.perf_counter() - t0:.1f}s "
            f"({(block.nbytes + obs.nbytes) / 1e9:.1f} GB memmapped)",
            file=sys.stderr,
        )
    else:
        block, obs = gc.make_workload(c, dtype=np.float32)

    from bayesian_ensembling_tpu.utils.profiling import device_sync as sync

    opt = args.optimizer
    rf = args.refine_f64
    if warm_stride:
        run_nits = fine_nits
        step = jax.jit(
            lambda b, o, gi: gc.gridded_experiment(
                b, o, run_nits, gp_init=gi, optimizer=opt, return_fit=rf
            )
        )
    else:
        run_nits = n_iters
        step = jax.jit(
            lambda b, o: gc.gridded_experiment(
                b, o, run_nits, optimizer=opt, return_fit=rf
            )
        )

    # Whole-grid mode: the inputs fit HBM, so transfer ONCE outside the
    # timed runs (the slab mode streams transfers by design and pipelines
    # them behind compute instead; --resident stages them once like the
    # whole-grid mode does and slices slabs on-device).
    h2d_s = None
    if not slab or slab >= c:
        block_dev = jax.device_put(block)
        obs_dev = jax.device_put(obs)
    elif args.resident:
        t0 = time.perf_counter()
        block_dev = jax.device_put(block)
        obs_dev = jax.device_put(obs)
        jax.block_until_ready((block_dev, obs_dev))
        h2d_s = time.perf_counter() - t0
        print(
            f"resident staging (one-off host->device, "
            f"{(block.nbytes + obs.nbytes) / 1e6:.0f} MB): {h2d_s:.1f}s",
            file=sys.stderr,
        )

    def run_once():
        # The coarse pass is part of the timed algorithm: its scratch fits
        # at the full step count are what buy the fine pass its short one.
        gp_init = (
            gc.coarse_params_for(
                np.arange(c), la, lo, warm_stride, n_iters, np.float32,
                optimizer=opt,
            )
            if warm_stride
            else None
        )
        if not slab or slab >= c:
            out = (
                step(block_dev, obs_dev, gp_init)
                if warm_stride
                else step(block_dev, obs_dev)
            )
            sync(out)
            bm = np.asarray(out[0], np.float64)
            bs = np.asarray(out[1], np.float64)
            if rf:
                return bm, bs, (
                    jax.tree.map(np.asarray, out[3]),
                    np.asarray(out[4]), np.asarray(out[5]),
                )
            return bm, bs
        out = slabbed_run(
            step, block, obs, slab, gp_init=gp_init, resident=args.resident,
            block_dev=block_dev if args.resident else None,
            obs_dev=obs_dev if args.resident else None,
            collect_fit=rf, stream=args.stream, progress=args.progress,
        )
        if rf:
            return out[0], out[1], (out[2], out[3], out[4])
        return out

    if args.warmup_slabs and warm_stride:
        ap.error("--warmup-slabs supports the non-warm slab modes only")
    if args.warmup_slabs and not (slab and slab < c):
        ap.error("--warmup-slabs needs a slab mode")
    t0 = time.perf_counter()
    if args.warmup_slabs:
        # Compile + populate the persistent cache on a short slab prefix —
        # the program is identical for every slab, so streaming the whole
        # grid once more buys nothing beyond the one compile.
        wc_ = min(args.warmup_slabs * slab, c)
        slabbed_run(
            step, block[:, :wc_], obs[:wc_], slab,
            collect_fit=rf, stream=args.stream, progress=args.progress,
        )
    else:
        run_once()
    print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    elapsed = float("inf")
    for rep in range(max(args.best_of, 1)):
        t0 = time.perf_counter()
        out = run_once()
        bary_mean, bary_std = out[0], out[1]
        rep_s = time.perf_counter() - t0
        if args.best_of > 1:
            print(f"rep {rep}: {rep_s:.1f}s", file=sys.stderr)
        elapsed = min(elapsed, rep_s)
    assert np.isfinite(bary_mean).all()

    compute_floor_s = overlap_eff = None
    if args.stream and not warm_stride:
        # Per-slab compute floor: three distinct slabs with operands
        # PRE-STAGED in HBM (fresh uploads — the tunnelled chip returns
        # ~0.04 ms for re-dispatches on already-seen buffers, so every
        # probe re-uploads; values being equal is fine, buffers must be
        # new).  median x n_slabs = what a zero-transfer-cost run would
        # take; floor/elapsed = how much of the staging the stream hid.
        n_slabs = -(-c // slab)
        dts = []
        for k in sorted({0, n_slabs // 2, n_slabs - 1}):
            lo_ = k * slab
            hi = min(lo_ + slab, c)
            pad = slab - (hi - lo_)
            bsl = np.ascontiguousarray(block[:, lo_:hi])
            osl = np.ascontiguousarray(obs[lo_:hi])
            if pad:
                bsl = np.concatenate([bsl, block[:, :pad]], axis=1)
                osl = np.concatenate([osl, obs[:pad]], axis=0)
            b_dev = jax.device_put(bsl)
            o_dev = jax.device_put(osl)
            jax.block_until_ready((b_dev, o_dev))
            t0 = time.perf_counter()
            out_p = step(b_dev, o_dev)
            jax.block_until_ready(out_p)
            dts.append(time.perf_counter() - t0)
        compute_floor_s = float(np.median(dts)) * n_slabs
        overlap_eff = compute_floor_s / elapsed
        print(
            f"stream overlap: per-slab compute {np.median(dts):.3f}s x "
            f"{n_slabs} slabs = {compute_floor_s:.1f}s floor vs "
            f"{elapsed:.1f}s streamed -> {100 * overlap_eff:.1f}% of the "
            "staging hidden behind compute",
            file=sys.stderr,
        )

    refine_s = parity_refined_matched = None
    if rf:
        bary_mean, bary_std, refine_s, parity_refined_matched = run_refine(
            args, block, obs, out[2], bary_mean, bary_std,
            slab=slab, c=c, m=m, r=r,
        )

    parity_mean = parity_std = None
    oracle_path = os.path.join(
        os.path.dirname(__file__),
        "gridded_oracle_warm.json" if warm_stride else "gridded_oracle.json",
    )
    if os.path.exists(oracle_path):
        with open(oracle_path) as f:
            loaded = json.load(f)
        oracle = select_oracle_entry(
            loaded, n_iters=n_iters, n_cells=c, warm_stride=warm_stride,
            fine_nits=fine_nits, lat=la, lon=lo, optimizer=opt,
        )
        if oracle is not None:
            nc = oracle["n_cells"]
            want_m = np.asarray(oracle["bary_mean"])
            want_s = np.asarray(oracle["bary_std"])
            parity_mean = float(np.abs(bary_mean[:nc] - want_m).max())
            parity_std = float(np.abs(bary_std[:nc] - want_s).max())
            print(
                f"gridded parity vs CPU float64 oracle ({nc} cells): "
                f"max |dmean| {parity_mean:.5f}, max |dstd| {parity_std:.5f}",
                file=sys.stderr,
            )
            if args.gate == "identity":
                # SystemExit, not assert: the gate must survive python -O
                # (ADVICE r3).
                if parity_mean >= MEAN_TOL:
                    raise SystemExit(
                        f"gridded mean divergence {parity_mean} >= {MEAN_TOL}"
                    )
                if parity_std >= STD_TOL:
                    raise SystemExit(
                        f"gridded std divergence {parity_std} >= {STD_TOL}"
                    )

    if args.gate == "identity" and parity_mean is None:
        check_identity_gate_ran(
            args.profile, oracle_path, opt=opt, n_iters=n_iters,
            warm_stride=warm_stride, fine_nits=fine_nits, lat=la, lon=lo,
        )

    quality_mean = quality_std = None
    if args.gate == "quality":
        base_path = os.path.join(os.path.dirname(__file__), "gridded_oracle.json")
        if not os.path.exists(base_path):
            raise SystemExit(
                "--gate quality needs adam oracle entries at "
                f"{QUALITY_TRUTH_NITS} (truth) and {QUALITY_BASELINE_NITS} "
                f"(baseline) steps in gridded_oracle.json — {base_path} "
                "does not exist; generate it with "
                f"`python benchmarks/gridded_oracle.py {QUALITY_TRUTH_NITS} 64` "
                f"and `python benchmarks/gridded_oracle.py {QUALITY_BASELINE_NITS} 64`"
            )
        with open(base_path) as f:
            base_loaded = json.load(f)
        quality_mean, quality_std = quality_gate_check(
            base_loaded, bary_mean, bary_std, n_cells=c, lat=la, lon=lo,
        )

    warm_tag = f"_warm{warm_stride}x{fine_nits}" if warm_stride else ""
    if opt != "adam":
        warm_tag += f"_{opt}"
    if args.resident and slab and slab < c:
        warm_tag += "_resident"
    if args.stream:
        warm_tag += "_stream"
    if rf:
        warm_tag += "_refined64"
    print(json.dumps({
        "metric": f"gridded_fit_ensemble_{m}x{c}cells_{n_iters}iters{warm_tag}",
        "value": round(elapsed, 3),
        "unit": "s",
        "h2d_s": round(h2d_s, 3) if h2d_s is not None else None,
        "v5e8_estimate": round(elapsed / 8, 3),
        "parity_pointwise_mean": round(parity_mean, 6) if parity_mean is not None else None,
        "parity_pointwise_std": round(parity_std, 6) if parity_std is not None else None,
        "gate": args.gate,
        "quality_vs_truth_mean": round(quality_mean, 6) if quality_mean is not None else None,
        "quality_vs_truth_std": round(quality_std, 6) if quality_std is not None else None,
        "compute_floor_s": (
            round(compute_floor_s, 3) if compute_floor_s is not None else None
        ),
        "overlap_efficiency": (
            round(overlap_eff, 4) if overlap_eff is not None else None
        ),
        "refine_s": round(refine_s, 3) if refine_s is not None else None,
        "parity_refined_matched": (
            float(f"{parity_refined_matched:.3e}")
            if parity_refined_matched is not None
            else None
        ),
    }))


if __name__ == "__main__":
    main()
