"""Precision-parity gates (BASELINE.md): the float32 TPU compute path must
reproduce the float64 CPU oracle's posterior moments within tolerance."""

import numpy as np
import jax.numpy as jnp

from bayesian_ensembling_tpu.ops import gp
from bayesian_ensembling_tpu.parallel.step import emulate_marginals


def make_problem(rng, t=64, d=8):
    x = rng.normal(size=(t, d))
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=t)
    noise = rng.uniform(0.05, 0.2, t)
    return x, y, noise


def test_posterior_moments_f32_vs_f64(rng):
    """Fixed hyperparameters: posterior mean within 1e-5 (absolute, data
    scale ~1) and variance within 1e-4 of the float64 oracle."""
    x, y, noise = make_problem(rng)
    params64 = gp.init_params(lengthscale=1.3, variance=0.8, dtype=jnp.float64)
    mean64, cov64 = gp.posterior(
        params64, jnp.asarray(x), jnp.asarray(y), jnp.asarray(noise)
    )
    params32 = gp.init_params(lengthscale=1.3, variance=0.8, dtype=jnp.float32)
    mean32, cov32 = gp.posterior(
        params32,
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(noise, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(mean32), np.asarray(mean64), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cov32).diagonal(), np.asarray(cov64).diagonal(),
        atol=1e-5, rtol=1e-3,
    )


def test_nlml_f32_vs_f64(rng):
    x, y, noise = make_problem(rng)
    p64 = gp.init_params(dtype=jnp.float64)
    p32 = gp.init_params(dtype=jnp.float32)
    v64 = float(gp.nlml(p64, jnp.asarray(x), jnp.asarray(y), jnp.asarray(noise)))
    v32 = float(
        gp.nlml(
            p32,
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32),
            jnp.asarray(noise, jnp.float32),
        )
    )
    np.testing.assert_allclose(v32, v64, rtol=1e-5)


def test_fused_pipeline_f32_vs_f64_trajectory(rng):
    """Short optimisation trajectories in f32 vs f64 produce marginals within
    loose tolerance (trajectory-level parity; converged-moment parity is the
    bench-level gate, BASELINE.md)."""
    m, r, t = 3, 4, 32
    block = rng.normal(size=(m, r, t)) + np.sin(np.linspace(0, 3, t))
    mask = np.ones((m, r), bool)
    mean64, var64 = emulate_marginals(
        jnp.asarray(block), jnp.asarray(mask), n_optim_nits=50, dba_iterations=3
    )
    mean32, var32 = emulate_marginals(
        jnp.asarray(block, jnp.float32), jnp.asarray(mask),
        n_optim_nits=50, dba_iterations=3,
    )
    np.testing.assert_allclose(np.asarray(mean32), np.asarray(mean64), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(var32), np.asarray(var64), rtol=2e-3, atol=1e-5
    )
