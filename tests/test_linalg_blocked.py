"""Correctness of the two-level blocked linalg hybrid (VERDICT r2 item 5).

On CPU the diagonal-block Pallas kernels fall back to XLA inside the same
blocked orchestration, so these tests validate the block algorithm
itself; on TPU the identical code runs the Pallas diagonal kernels.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_ensembling_tpu.ops import linalg_blocked as lb
from bayesian_ensembling_tpu.ops import linalg_pallas as lp


def spd_batch(rng, b, t, dtype=np.float64):
    a = rng.normal(size=(b, t, t)).astype(dtype)
    return a @ np.swapaxes(a, -1, -2) + t * np.eye(t, dtype=dtype)


@pytest.mark.parametrize("t", [64, 100, 128, 300])
def test_blocked_cholesky_matches_xla(rng, t):
    ky = spd_batch(rng, 3, t)
    ky_tlb = jnp.transpose(jnp.asarray(ky), (1, 2, 0))
    got = lb.blocked_cholesky(ky_tlb, nb=64)
    want = jnp.transpose(jnp.linalg.cholesky(jnp.asarray(ky)), (2, 1, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-8)


@pytest.mark.parametrize("t", [64, 100, 300])
def test_blocked_tri_inv_matches_dense(rng, t):
    ky = spd_batch(rng, 2, t)
    l = np.linalg.cholesky(ky)
    lt = jnp.transpose(jnp.asarray(l), (2, 1, 0))
    got = lb.blocked_tri_inv(lt, nb=64)  # (T, T, B) rows of W
    want = np.stack([np.linalg.inv(li) for li in l])  # (B, T, T)
    got_btt = np.transpose(np.asarray(got), (2, 0, 1))
    np.testing.assert_allclose(got_btt, want, atol=1e-8)


@pytest.mark.parametrize("t", [64, 100, 300])
def test_blocked_solve_vec_matches_dense(rng, t):
    ky = spd_batch(rng, 2, t)
    y = rng.normal(size=(2, t))
    l = np.linalg.cholesky(ky)
    lt = jnp.transpose(jnp.asarray(l), (2, 1, 0))
    z, alpha, logdet = lb.blocked_solve_vec(lt, jnp.asarray(y.T), nb=64)
    z_want = np.stack(
        [np.linalg.solve(li, yi) for li, yi in zip(l, y)]
    )
    a_want = np.stack([np.linalg.solve(k, yi) for k, yi in zip(ky, y)])
    ld_want = np.array([np.linalg.slogdet(k)[1] for k in ky])
    np.testing.assert_allclose(np.asarray(z).T, z_want, atol=1e-8)
    np.testing.assert_allclose(np.asarray(alpha).T, a_want, atol=1e-7)
    np.testing.assert_allclose(np.asarray(logdet), ld_want, atol=1e-8)


def test_nlml_terms_blocked_matches_reference(rng):
    """Values AND custom-VJP gradients equal the existing nlml_terms."""
    t, b = 200, 3
    ky = jnp.asarray(spd_batch(rng, b, t))
    y = jnp.asarray(rng.normal(size=(b, t)))

    q1, d1 = lp.nlml_terms(ky, y)
    q2, d2 = lb.nlml_terms_blocked(ky, y, 64)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=1e-10)

    def loss_ref(ky, y):
        q, d = lp.nlml_terms(ky, y)
        return jnp.sum(0.7 * q + 1.3 * d)

    def loss_blk(ky, y):
        q, d = lb.nlml_terms_blocked(ky, y, 64)
        return jnp.sum(0.7 * q + 1.3 * d)

    g1 = jax.grad(loss_ref, argnums=(0, 1))(ky, y)
    g2 = jax.grad(loss_blk, argnums=(0, 1))(ky, y)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-8)


def test_blocked_cholesky_odd_sizes(rng):
    """T not a block multiple: identity-tail padding must be invisible."""
    t = 150  # 150 = 2*64 + 22
    ky = spd_batch(rng, 2, t)
    ky_tlb = jnp.transpose(jnp.asarray(ky), (1, 2, 0))
    got = lb.blocked_cholesky(ky_tlb, nb=64)
    want = jnp.transpose(jnp.linalg.cholesky(jnp.asarray(ky)), (2, 1, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-8)
