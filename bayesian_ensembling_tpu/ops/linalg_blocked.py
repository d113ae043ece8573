"""Recursive blocked NLML terms for the monthly-T regime.

The batch-in-lanes Pallas kernels (ops/linalg_pallas.py) own T <= ~169,
where the whole (T, T, 128-lane) problem fits scoped VMEM and the VPU is
the right unit.  Beyond that the repo previously dispatched straight to
XLA's blocked decompositions, which reach only ~10.8% of f32 MXU peak at
the SSP monthly resolution T = 1032 / B = 112 (BASELINE.md "Large-T"
table).  This module is the hybrid VERDICT r2 item 5 asked to measure:

  * diagonal nb x nb blocks are factorised/inverted by the EXISTING
    batch-in-lanes Pallas kernels (VPU work, the part XLA does worst);
  * everything else is a handful of LARGE batched GEMMs left to
    XLA -> MXU, where they tile well.

The recursion (``_rec_inv_logdiag``) computes ``W = L^-1`` jointly with
the factor's log-diagonal, so the NLML forward is two matvecs and the
custom-VJP backward gets ``K^-1 = W^T W`` with no extra factorisation.
A column-blocked scheme (right-looking panels, O(n_blocks^2) small
dependent matmuls) was measured first and REJECTED at 1.33x vs the
recursion's 2.05x (BASELINE.md); its implementation was removed —
``nlml_terms_blocked`` is the only production entry point, dispatched by
``linalg_pallas.linalg_path(t, b=batch)`` from the fused NLML step.

Layout: ``(T, T, B)`` "tlb" at the linalg_pallas boundary (rows of the
factor = columns of L, i.e. the L^T layout the Pallas kernels emit);
the MXU stages run in ``(B, T, T)``.

Everything is jit-friendly: the recursion is unrolled at trace time with
static split points.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp

from bayesian_ensembling_tpu.ops import linalg_pallas as lp

__all__ = [
    "nlml_terms_blocked",
    "DEFAULT_BLOCK",
]

# 128 keeps the diagonal-block Pallas kernels inside their VMEM gate at
# any lane chunk (128 x 136 x 4 B x 128 lanes ~ 8.5 MiB) and matches the
# MXU tile edge for the panel matmuls.
DEFAULT_BLOCK = 128

_HI = jax.lax.Precision.HIGHEST


def _pad_to_block(a_btt: jnp.ndarray, nb: int) -> tp.Tuple[jnp.ndarray, int]:
    """Pad (B, T, T) to a block multiple with an identity tail (keeps the
    padded matrix SPD and the tail's factor = I, so no masking needed)."""
    t = a_btt.shape[-1]
    tp_ = -(-t // nb) * nb
    if tp_ == t:
        return a_btt, t
    pad = tp_ - t
    a_btt = jnp.pad(a_btt, ((0, 0), (0, pad), (0, pad)))
    eye_tail = jnp.zeros((tp_, tp_), a_btt.dtype).at[
        jnp.arange(t, tp_), jnp.arange(t, tp_)
    ].set(1.0)
    return a_btt + eye_tail[None], t


def _diag_chol(block_btt: jnp.ndarray) -> jnp.ndarray:
    """(B, nb, nb) SPD diagonal block -> lower factor, via the Pallas
    batch-in-lanes kernel on TPU (tlb layout round-trip)."""
    lt = lp.cholesky_batched(jnp.transpose(block_btt, (1, 2, 0)))
    return jnp.transpose(lt, (2, 1, 0))  # (B, nb, nb) lower


def _diag_tri_inv(l_btt: jnp.ndarray) -> jnp.ndarray:
    """(B, nb, nb) lower factor -> L^-1 (lower), via the Pallas kernel."""
    w = lp.tri_inv_batched(jnp.transpose(l_btt, (2, 1, 0)))  # rows of W
    return jnp.transpose(w, (2, 0, 1))  # (B, nb, nb) lower


def _rec_inv_logdiag(a_btt: jnp.ndarray, nb: int):
    """Recursive 2x2-block Cholesky inverse: ``(W = L^-1, sum log diag L)``.

    The classic recursion::

        [[A, B^T],      L = [[LA,  0 ],     W = [[WA,          0 ],
         [B, C  ]]           [Lb,  LC]]          [-WC Lb WA,   WC]]

        Lb = B WA^T;  S = C - Lb Lb^T;  WC = recurse(S)

    turns a column-blocked scheme's O(n_blocks^2) *small dependent*
    matmuls into O(log) *large* GEMMs — the shape the MXU actually tiles
    well — while the <= nb base case stays on the Pallas batch-in-lanes
    kernels.  The full factor L is never assembled: the NLML consumes only
    W (for z/alpha/K^-1) and L's log-diagonal (for logdet), and skipping
    L's block concatenations saves ~1 GB of pure HBM copies per call at
    (B=112, T=1032) f32.  Requires n to be a multiple of nb (callers pad
    with an identity tail).
    """
    n = a_btt.shape[-1]
    if n <= nb:
        l = _diag_chol(a_btt)
        sld = jnp.sum(
            jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)), axis=-1
        )
        return _diag_tri_inv(l), sld
    h = (n // 2 + nb - 1) // nb * nb
    if h >= n:
        h = n - nb
    a11 = a_btt[:, :h, :h]
    a21 = a_btt[:, h:, :h]
    a22 = a_btt[:, h:, h:]
    wa, sa = _rec_inv_logdiag(a11, nb)
    lb = jnp.matmul(a21, jnp.swapaxes(wa, -1, -2), precision=_HI)
    s = a22 - jnp.matmul(lb, jnp.swapaxes(lb, -1, -2), precision=_HI)
    wc, sc = _rec_inv_logdiag(s, nb)
    x = -jnp.matmul(wc, jnp.matmul(lb, wa, precision=_HI), precision=_HI)
    zeros = jnp.zeros((a_btt.shape[0], h, n - h), a_btt.dtype)
    w = jnp.concatenate(
        [
            jnp.concatenate([wa, zeros], axis=2),
            jnp.concatenate([x, wc], axis=2),
        ],
        axis=1,
    )
    return w, sa + sc


def _nlml_fwd_impl_blocked(ky, y, nb):
    """Forward NLML terms via the recursive chol+inverse.

    With W = L^-1 in hand, everything is GEMM/ matvec work:
    z = W y, alpha = W^T z, logdet = 2 sum log diag L; the bwd pass reuses
    W for K^-1 = W^T W with zero extra factorisation work.
    """
    a, t_orig = _pad_to_block(jnp.asarray(ky), nb)
    w, sumlog = _rec_inv_logdiag(a, nb)
    # The identity-tail padding contributes exactly 0 to sum log diag and
    # an identity block to W; padded y entries are 0, so z/alpha padding
    # stays 0 and no slicing copy of the (B, Tp, Tp) W is needed for the
    # solves — only the residual is trimmed.
    yb = jnp.pad(y, ((0, 0), (0, a.shape[-1] - t_orig)))
    z = jnp.einsum("bij,bj->bi", w, yb, precision=_HI)
    alpha = jnp.einsum("bji,bj->bi", w, z, precision=_HI)[:, :t_orig]
    quad = jnp.sum(jnp.square(z), axis=-1)
    logdet = 2.0 * sumlog
    return quad, logdet, (w[:, :t_orig, :t_orig], alpha.T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def nlml_terms_blocked(ky: jnp.ndarray, y: jnp.ndarray, nb: int = DEFAULT_BLOCK):
    """Blocked twin of ``linalg_pallas.nlml_terms`` for the large-T regime.

    Identical math and custom-VJP structure (d quad = -alpha alpha^T,
    d logdet = K^-1 via W^T W); the factorisation/solve/inverse stages run
    through the blocked hybrid instead of XLA's monolithic decompositions.
    """
    quad, logdet, _ = _nlml_fwd_impl_blocked(ky, y, nb)
    return quad, logdet


def _nlml_blocked_fwd(ky, y, nb):
    quad, logdet, res = _nlml_fwd_impl_blocked(ky, y, nb)
    return (quad, logdet), res


def _nlml_blocked_bwd(nb, res, cots):
    w_btt, alpha = res  # W = L^-1 from the fwd recursion — no extra factorisation
    g_quad, g_logdet = cots
    kinv = jnp.matmul(
        jnp.swapaxes(w_btt, -1, -2), w_btt, precision=jax.lax.Precision.DEFAULT
    )
    alpha_bt = alpha.T
    outer = alpha_bt[:, :, None] * alpha_bt[:, None, :]
    g_ky = g_logdet[:, None, None] * kinv - g_quad[:, None, None] * outer
    g_y = 2.0 * g_quad[:, None] * alpha_bt
    return g_ky, g_y


nlml_terms_blocked.defvjp(_nlml_blocked_fwd, _nlml_blocked_bwd)
