"""Correctness of the recursive blocked NLML hybrid (VERDICT r2 item 5).

On CPU the diagonal-block Pallas kernels fall back to XLA inside the same
blocked orchestration, so these tests validate the recursion itself; on
TPU the identical code runs the Pallas diagonal kernels.
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


@pytest.mark.parametrize(
    ("t", "nb"),
    [
        (64, 64),   # single base-case block
        (100, 64),  # one padded block
        (150, 64),  # 2 blocks + identity-tail padding mid-recursion
        (300, 64),  # multi-level recursion, padded
        (200, 128), # uneven split with the production block size
    ],
)
def test_nlml_terms_blocked_sizes(rng, t, nb):
    """Identity-tail padding and the recursive split must be invisible at
    every size class the dispatch admits (the bug class the removed
    column-blocked tests covered, now through the production entry point)."""
    b = 2
    ky = jnp.asarray(spd_batch(rng, b, t))
    y = jnp.asarray(rng.normal(size=(b, t)))
    q1, d1 = lp.nlml_terms(ky, y)
    q2, d2 = lb.nlml_terms_blocked(ky, y, nb)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=1e-9)


def test_rec_inv_logdiag_identity(rng):
    """W = L^-1 and sum log diag L on a known factorisation."""
    t, b, nb = 150, 2, 64
    ky = spd_batch(rng, b, t)
    a, t_orig = lb._pad_to_block(jnp.asarray(ky), nb)
    w, sld = lb._rec_inv_logdiag(a, nb)
    l = np.linalg.cholesky(ky)
    w_want = np.stack([np.linalg.inv(li) for li in l])
    np.testing.assert_allclose(
        np.asarray(w)[:, :t_orig, :t_orig], w_want, atol=1e-8
    )
    sld_want = np.log(np.diagonal(l, axis1=-2, axis2=-1)).sum(axis=-1)
    # identity tail contributes log(1) = 0
    np.testing.assert_allclose(np.asarray(sld), sld_want, atol=1e-9)
