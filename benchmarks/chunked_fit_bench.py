"""Measure the host-chunking overhead of the bounded-execution GP fit.

Compares ``ops/gp.fit_gp_batch`` (one merged scan program) against
``fit_gp_batch_chunked`` (host loop of short segments, carried optimiser
state — the path that survives execution-time-capped environments; see
docs/architecture.md "Bounded executions") at the two production shapes:

  * annual headline:  B=112 models, T=165   (merged 7-SSP experiment)
  * monthly prefit:   B=16 models,  T=1980  (the shape whose merged
                      2500-step execution the tunnel watchdog kills)

Reports steady-state wall time (min over reps, compile excluded) for the
merged program and for chunked runs at a sweep of chunk sizes, so the
"prefer merged when executions are unconstrained" guidance in the docs is
a measured claim rather than an assumption.

Timing notes (both bugs were observed on the tunnelled chip):
  * ``jax.block_until_ready`` is unreliable on the tunnelled backend —
    sync via a device->host copy (``utils.profiling.device_sync``).
  * Re-running a program on IDENTICAL input buffers can return in ~0.1 ms
    (execution dedup behind the tunnel) — every timed rep uses its own
    input arrays.

If the merged monthly run is killed by the execution watchdog, that IS the
failure mode the chunked path exists for: the script records the death and
cross-checks the chunked losses against each other instead.

Usage: python benchmarks/chunked_fit_bench.py [--steps 500] [--reps 3]
"""

import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunks", default="50,100,250")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesian_ensembling_tpu.ops import gp
    from bayesian_ensembling_tpu.utils.profiling import device_sync

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    chunks = [int(c) for c in args.chunks.split(",")]

    for label, b, t, d in (("annual-headline", 112, 165, 29),
                           ("monthly-hist", 16, 1980, 29)):
        # One input set per rep (plus one for compile/correctness) so no
        # two timed executions share buffers.
        variants = []
        for _ in range(args.reps + 1):
            variants.append((
                jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32),
                jnp.asarray(rng.normal(size=(b, t)), jnp.float32),
                jnp.asarray(rng.uniform(0.05, 0.2, size=(b, t)), jnp.float32),
            ))

        def run_merged(v):
            x, y, nv = v
            p, l = gp.fit_gp_batch(x, y, nv, n_optim_nits=args.steps)
            device_sync((p, l))
            return l

        def run_chunked(v, c):
            x, y, nv = v
            p, l = gp.fit_gp_batch_chunked(
                x, y, nv, n_optim_nits=args.steps, chunk_steps=c
            )
            device_sync((p, l))
            return l

        def best_of(fn):
            best = float("inf")
            for r in range(args.reps):
                t0 = time.perf_counter()
                fn(variants[1 + r])
                best = min(best, time.perf_counter() - t0)
            return best

        l_m = None
        try:
            l_m = np.asarray(run_merged(variants[0]))  # compile + oracle
            best_m = best_of(run_merged)
            print(f"{label} (B={b}, T={t}): merged {args.steps} steps: "
                  f"{best_m:.3f}s", flush=True)
        except Exception as e:  # watchdog kill on the long execution
            best_m = None
            print(f"{label} (B={b}, T={t}): merged {args.steps} steps: "
                  f"KILLED ({type(e).__name__}) — the bounded-execution "
                  f"failure the chunked path exists for", flush=True)

        l_ref = l_m
        for c in chunks:
            l_c = np.asarray(run_chunked(variants[0], c))  # compile
            if l_ref is None:
                l_ref = l_c  # cross-check chunk sizes against each other
            else:
                np.testing.assert_allclose(
                    l_c, l_ref, rtol=2e-4, atol=1e-5
                )  # same step sequence (f32 fusion-level diffs only)
            best_c = best_of(lambda v: run_chunked(v, c))
            rel = f" ({best_c / best_m:.2f}x merged)" if best_m else ""
            print(f"  chunk={c:4d}: {best_c:.3f}s{rel}", flush=True)


if __name__ == "__main__":
    main()
