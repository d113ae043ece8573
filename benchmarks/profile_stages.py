"""Per-stage breakdown + hardware-utilisation estimate of the headline bench.

Times each stage of the fused 7-SSP experiment separately on the device
(VERDICT r1 item 7: quantify "fast" with a utilisation number), and derives
an MFU-style estimate for the NLML optimisation step — the dominant stage —
from first-principles FLOP counts.

Usage: python benchmarks/profile_stages.py [n_optim_nits]
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


def timed(f, *args, n=5):
    out = f(*args)
    for leaf in __import__("jax").tree_util.tree_leaves(out):
        np.asarray(leaf)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    for leaf in __import__("jax").tree_util.tree_leaves(out):
        np.asarray(leaf)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu import pipeline
    from bayesian_ensembling_tpu.ops import dtw as dtw_ops
    from bayesian_ensembling_tpu.ops import gp as gp_ops
    from bayesian_ensembling_tpu.ops import scoring
    from bayesian_ensembling_tpu.parallel.step import pad_models

    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    # Assemble exactly the bench's merged workload.
    obs_pm = pipeline.load_observations()
    obs = jnp.asarray(obs_pm.data.values, dtype=jnp.float32)
    scenarios = [(s, *pipeline.load_scenario(s)) for s in pipeline.ALL_SSPS]
    m_max = max(len(h) for _, h, _ in scenarios)
    r_max = max(max(h.max_realisations, s.max_realisations) for _, h, s in scenarios)
    packed = []
    for _, hist, ssp_mc in scenarios:
        hb, hm = hist.padded_stack(r_target=r_max)
        hb, hm, mm = pad_models(hb, hm, m_max)
        packed.append((hb, hm, mm))
    hb = jnp.asarray(np.concatenate([p[0] for p in packed]))
    hm = jnp.asarray(np.concatenate([p[1] for p in packed]))
    b, r, t = hb.shape
    print(f"merged hist workload: B={b}, R={r}, T={t}", file=sys.stderr)

    # Stage 1: DBA (fused Pallas kernel), 10 iterations.
    f_dba = jax.jit(functools.partial(dtw_ops.dba_batch, n_iterations=10, init="mean"))
    t_dba = timed(f_dba, hb, hm)
    y_mean = f_dba(hb, hm)

    w = hm.astype(hb.dtype)
    n = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mu_r = jnp.einsum("mrt,mr->mt", hb, w) / n[:, None]
    y_var = jnp.maximum(
        jnp.einsum("mrt,mr->mt", jnp.square(hb - mu_r[:, None, :]), w) / n[:, None],
        1e-8,
    )
    x = jnp.swapaxes(hb, 1, 2)

    # Stage 2: NLML hyperparameter optimisation (the 2000-step Adam scan).
    f_fit = jax.jit(
        functools.partial(gp_ops.fit_gp_batch, kernel_name="matern32", n_optim_nits=n_iters)
    )
    t_fit = timed(lambda *a: f_fit(*a)[0], x, y_mean, y_var, n=3)
    params, _ = f_fit(x, y_mean, y_var)

    # Stage 3: posterior marginals.
    f_post = jax.jit(
        functools.partial(gp_ops.posterior_marginals_batch, kernel_name="matern32")
    )
    t_post = timed(f_post, params, x, y_mean, y_var)

    # Stage 4: weighting + barycentre (CRPS tail on the hist shapes).
    mean, var = f_post(params, x, y_mean, y_var)

    def tail(mean, var, obs):
        score = jax.vmap(scoring.mean_gaussian_crps, in_axes=(0, 0, None))(
            mean, jnp.sqrt(var), obs
        )
        raw = 1.0 / score
        wts = raw / jnp.sum(raw, axis=0, keepdims=True)
        wm = jnp.mean(wts, axis=1)
        return jnp.sum(wm[:, None] * mean, axis=0), jnp.sum(
            wm[:, None] * jnp.sqrt(var), axis=0
        )

    t_tail = timed(jax.jit(tail), mean, var, obs)

    # --- FLOP accounting for one NLML value_and_grad step (per batch elem):
    #   gram (pairwise |x_i - x_j|^2 over R features + kernel):  ~3 R T^2
    #   cholesky fwd:                                            T^3/3
    #   fused solves + logdet:                                   ~4 T^2
    #   backward: tri-inv T^3/3 + W^T W (MXU matmul) 2 T^3/... per *pair* T^3
    #   outer products + kernel VJP:                             ~6 R T^2 + T^2
    flops_step = b * (
        3 * r * t * t  # gram + distance
        + t**3 / 3  # cholesky
        + 4 * t * t  # solves
        + t**3 / 3  # tri-inv
        + 2 * t**3  # W^T W matmul (f32 on MXU)
        + 6 * r * t * t  # gram VJP
    )
    total_fit_flops = flops_step * n_iters
    flops_per_s = total_fit_flops / t_fit
    # v5e peak: 197 TFLOP/s bf16 MXU; f32 MXU ~ 1/4; VPU f32 ~ O(1) TFLOP/s.
    mfu_bf16 = flops_per_s / 197e12

    total = t_dba + t_fit + t_post + t_tail
    result = {
        "n_optim_nits": n_iters,
        "stage_seconds": {
            "dba_10iters": round(t_dba, 4),
            "nlml_opt_scan": round(t_fit, 4),
            "posterior_marginals": round(t_post, 4),
            "weight_barycentre_tail": round(t_tail, 4),
        },
        "stage_share": {
            "dba": round(t_dba / total, 3),
            "nlml_opt": round(t_fit / total, 3),
            "posterior": round(t_post / total, 3),
            "tail": round(t_tail / total, 3),
        },
        "nlml_step_us": round(t_fit / n_iters * 1e6, 1),
        "nlml_gflops_per_s": round(flops_per_s / 1e9, 1),
        "mfu_vs_bf16_peak": round(mfu_bf16, 4),
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
