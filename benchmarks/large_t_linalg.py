"""Measure the batched GP linalg at monthly resolutions (large T).

The batch-in-lanes Pallas kernels cap at T ~ 169 (one (T, T, 128) f32 VMEM
buffer); the bundled *monthly* workloads (T = 1032 SSP / 1980 historical,
reference data shapes at /root/reference/experiments/data) run through XLA's
blocked decompositions instead (ops/linalg_pallas.linalg_path).  This script
quantifies that fallback: per-call wall-clock of the full NLML
value_and_grad step (the 2000x hot op of every fit) and of XLA's batched
cholesky alone, against the f32 MXU roofline, so the "is a blocked Pallas
kernel worth building?" decision is measured, not guessed.

Usage: python benchmarks/large_t_linalg.py [B] [T ...]
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from bayesian_ensembling_tpu.ops import gp as gp_ops

# v5e peak: 197 TFLOP/s bf16 MXU, ~1/4 that for f32 multiplicands.
F32_MXU_PEAK = 49e12


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # tunnel sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 112
    ts = [int(a) for a in sys.argv[2:]] or [165, 512, 1032, 1980]
    rng = np.random.default_rng(0)

    for t in ts:
        # Cap the live (B, T, T) working set (~5 buffers in the v&g step) so
        # the largest T fits HBM; report the actual B used.
        b_t = min(b, max(int(0.6e9 / (t * t * 4)) // 16 * 16, 16))
        # Realistic GP workload: Matern-3/2 gram on realisation features.
        x = jnp.asarray(rng.normal(size=(b_t, t, 4)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(b_t, t)).astype(np.float32))
        noise = jnp.asarray(
            (0.1 + rng.random((b_t, t))).astype(np.float32)
        )
        params = jax.vmap(lambda _: gp_ops.init_params(dtype=y.dtype))(
            jnp.arange(b_t)
        )

        kernel_pre, apply_fn = gp_ops.get_kernel_precomputed("matern32")
        stat = jax.vmap(kernel_pre)(x, x)

        from bayesian_ensembling_tpu.ops.linalg_pallas import linalg_path, nlml_terms

        # Data enters as jit ARGUMENTS (closure constants are embedded in the
        # compile payload, which the tunnelled backend size-caps).
        def nlml_step(params_b, stat_, y_, noise_):
            def total(pb):
                ky = jax.vmap(
                    lambda p, s, nv: apply_fn(p, s) + jnp.diag(nv + 1e-6)
                )(pb, stat_, noise_)
                quad, logdet = nlml_terms(ky, y_)
                return jnp.sum(0.5 * (quad + logdet))

            return jax.value_and_grad(total)(params_b)

        step = jax.jit(nlml_step)
        t_step = timeit(step, params, stat, y, noise, n=5 if t > 900 else 20)

        # Reduce the factor on device — fetching a (B, T, T) result over the
        # tunnelled link would swamp the timing with transfer.
        chol = jax.jit(lambda ky: jnp.sum(jnp.linalg.cholesky(ky)))
        ky0 = jax.jit(
            lambda pb, s, nv: jax.vmap(
                lambda p, si, nvi: apply_fn(p, si) + jnp.diag(nvi + 1e-6)
            )(pb, s, nv)
        )(params, stat, noise)
        t_chol = timeit(chol, ky0, n=5 if t > 900 else 20)

        # The two-level blocked hybrid (VERDICT r2 item 5): Pallas diagonal
        # blocks + MXU panel/trailing matmuls (ops/linalg_blocked.py).
        # Measured only where the plain Pallas path does NOT own T already.
        t_step_blk = None
        if linalg_path(t, b=b_t) != "pallas":
            from bayesian_ensembling_tpu.ops.linalg_blocked import (
                nlml_terms_blocked,
            )

            def nlml_step_blk(params_b, stat_, y_, noise_):
                def total(pb):
                    ky = jax.vmap(
                        lambda p, s, nv: apply_fn(p, s) + jnp.diag(nv + 1e-6)
                    )(pb, stat_, noise_)
                    quad, logdet = nlml_terms_blocked(ky, y_, int(os.environ.get('BLK_NB', '128')))
                    return jnp.sum(0.5 * (quad + logdet))

                return jax.value_and_grad(total)(params_b)

            step_blk = jax.jit(nlml_step_blk)
            t_step_blk = timeit(
                step_blk, params, stat, y, noise, n=5 if t > 900 else 20
            )

        chol_flops = 2 * b_t * t**3 / 3
        # step ~ fwd chol (T^3/3) + tri-inv for K^-1 (T^3/2 + T^3 matmul)
        step_flops = 2 * b_t * (t**3 / 3 + t**3 / 2 + t**3)
        blk = (
            f"  |  blocked-hybrid(nb={os.environ.get('BLK_NB', '128')}) step: {t_step_blk * 1e3:8.2f} ms "
            f"({100 * step_flops / t_step_blk / F32_MXU_PEAK:4.1f}% f32 MXU, "
            f"{t_step / t_step_blk:4.2f}x vs xla)"
            if t_step_blk
            else ""
        )
        print(
            f"T={t:5d} B={b_t}  path={linalg_path(t, b=b_t):7s}  "
            f"nlml v&g step: {t_step * 1e3:8.2f} ms "
            f"({step_flops / t_step / 1e12:5.2f} TFLOP/s, "
            f"{100 * step_flops / t_step / F32_MXU_PEAK:4.1f}% f32 MXU)  |  "
            f"xla chol: {t_chol * 1e3:8.2f} ms "
            f"({chol_flops / t_chol / 1e12:5.2f} TFLOP/s)" + blk,
            flush=True,
        )


if __name__ == "__main__":
    main()
