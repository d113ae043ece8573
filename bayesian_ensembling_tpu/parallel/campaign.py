"""Deduplicated multi-scenario campaign: pack once, fit unique models, shard.

The 7-SSP experiment's padded ``(S, M)`` scenario layout re-fits every
(scenario, model) slot, but a historical model's anomaly series is
byte-identical across every SSP collection it appears in — the campaign
really contains only ~20 distinct historical and ~65 distinct SSP fits
(experiment-level common-subexpression elimination the reference's
per-scenario scripts never exploit; BASELINE.md "The COMPLETE native-monthly
campaign").  This module owns that packing and provides BOTH execution
forms:

* :func:`run_dedup_campaign` — the single-chip runner (host-chunked
  historical emulation for HBM bounding at T = 1980).
* :func:`make_sharded_dedup_campaign` — the multi-chip form: the UNIQUE-fit
  axes are sharded over a mesh axis with ``shard_map`` (each device fits
  ``ceil(U/n)`` historical + ``ceil(B_ssp/n)`` SSP emulators; fits never
  couple, so the emulation stage is collective-free), marginals are gathered
  back into the ``(S, M)`` layout (one small all-gather of ``(U, T)``
  marginal arrays — the fit inputs stay device-local), and the cheap
  weighting/barycentre tail runs data-parallel under ``jit`` with XLA's
  collectives at the reference's cross-model couplings.

Reference provenance: the campaign loop is ``PerfectModelTest``-adjacent
experiment drive (``full_experiment_script.py:87-143`` run for 7 SSPs); the
reference has no parallel or deduplicated form (SURVEY §2.4).
"""

from __future__ import annotations

import dataclasses
import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from bayesian_ensembling_tpu.parallel.step import (
    chunked_marginals,
    emulate_marginals,
    multi_scenario_tail,
    pad_models,
)

__all__ = [
    "DedupCampaign",
    "pack_dedup_campaign",
    "run_dedup_campaign",
    "make_sharded_dedup_campaign",
    "pad_unique_axis",
]


@dataclasses.dataclass
class DedupCampaign:
    """Device-ready packing of a multi-scenario campaign.

    Scenario layout (for the tail): ``hb/hm`` (S, M, R, T_hist)/(S, M, R)
    zero-padded historical blocks + masks, ``sb/sm`` the SSP twins,
    ``mmask`` (S, M) zeroing padded model slots.

    Unique-fit layout (for the emulation stage): ``uh/um`` (U, R, T_hist)
    one row per distinct historical model, ``usb/usm`` (B_ssp, R, T_ssp)
    one row per real (scenario, model) SSP pair, and the gather maps
    ``uidx/sidx`` (S, M) from scenario slots into the unique axes.
    """

    hb: np.ndarray
    hm: np.ndarray
    sb: np.ndarray
    sm: np.ndarray
    mmask: np.ndarray
    uh: np.ndarray
    um: np.ndarray
    usb: np.ndarray
    usm: np.ndarray
    uidx: np.ndarray
    sidx: np.ndarray
    names: tp.Tuple[str, ...]

    @property
    def n_fits(self) -> int:
        return self.uh.shape[0] + self.usb.shape[0]


def pack_dedup_campaign(scenarios) -> DedupCampaign:
    """Pack ``[(name, hist_collection, ssp_collection), ...]`` for the
    campaign runners.

    Historical rows are deduplicated by model name; the anomaly data and
    realisation mask are asserted byte-identical across scenarios (they are
    by construction — the climatology is the model's own historical one).
    """
    m_max = max(len(h) for _, h, _ in scenarios)
    r_max = max(
        max(h.max_realisations, s.max_realisations) for _, h, s in scenarios
    )
    s = len(scenarios)
    packed, prepad = [], []
    for _, hist, ssp_mc in scenarios:
        hb_, hm_ = hist.padded_stack(r_target=r_max)
        sb_, sm_ = ssp_mc.padded_stack(r_target=r_max)
        prepad.append((hb_, hm_, sb_, sm_))
        hb_, hm_, mmask_ = pad_models(hb_, hm_, m_max)
        sb_, sm_, _ = pad_models(sb_, sm_, m_max)
        packed.append((hb_, hm_, sb_, sm_, mmask_))
    hb, hm, sb, sm, mmask = (
        np.stack([p[i] for p in packed]) for i in range(5)
    )

    uniq: dict = {}
    uidx = np.zeros((s, m_max), np.int64)
    sidx = np.zeros((s, m_max), np.int64)
    ssp_rows, ssp_masks = [], []
    for si, (_, hist, ssp_mc) in enumerate(scenarios):
        hb_, hm_, sb_, sm_ = prepad[si]
        for mi, name in enumerate(hist.model_names):
            if name in uniq:
                k, row, mrow = uniq[name]
                assert np.array_equal(row, hb_[mi]) and np.array_equal(
                    mrow, hm_[mi]
                ), (
                    f"historical anomalies for {name} differ between "
                    "scenarios — dedup invalid"
                )
            else:
                k = len(uniq)
                uniq[name] = (k, hb_[mi], hm_[mi])
            uidx[si, mi] = k
            sidx[si, mi] = len(ssp_rows)
            ssp_rows.append(sb_[mi])
            ssp_masks.append(sm_[mi])
        # padded model slots keep index 0; mmask zeroes them downstream
    return DedupCampaign(
        hb=hb, hm=hm, sb=sb, sm=sm, mmask=mmask,
        uh=np.stack([v[1] for v in uniq.values()]),
        um=np.stack([v[2] for v in uniq.values()]),
        usb=np.stack(ssp_rows),
        usm=np.stack(ssp_masks),
        uidx=uidx, sidx=sidx,
        names=tuple(n for n, _, _ in scenarios),
    )


def pad_unique_axis(block: np.ndarray, mask: np.ndarray, multiple: int):
    """Pad a unique-fit axis to a multiple of the mesh size with REPLICATED
    real rows (well-conditioned math on every lane; the gather indices only
    reference real rows, so replicas never reach the tail)."""
    u = block.shape[0]
    target = -(-u // multiple) * multiple
    pad = target - u
    if not pad:
        return block, mask
    reps = -(-pad // u)
    fb = np.concatenate([block] * reps, axis=0)[:pad]
    fm = np.concatenate([mask] * reps, axis=0)[:pad]
    return np.concatenate([block, fb], axis=0), np.concatenate([mask, fm], axis=0)


@functools.lru_cache(maxsize=None)
def _em_jit(fit_kw_items):
    """One jit wrapper per fit configuration — repeated campaign runs (the
    bench's warmup + timed pattern) must hit the in-memory executable cache
    instead of re-tracing a fresh ``jit(partial(...))`` each call."""
    return jax.jit(functools.partial(emulate_marginals, **dict(fit_kw_items)))


@functools.lru_cache(maxsize=None)
def _tail_jit(weight_kind, sigma_mode):
    return jax.jit(
        functools.partial(
            multi_scenario_tail, weight_kind=weight_kind, sigma_mode=sigma_mode
        )
    )


def run_dedup_campaign(
    pack: DedupCampaign,
    obs: jnp.ndarray,
    *,
    hist_chunk: int = 28,
    weight_kind: str = "crps",
    sigma_mode: str = "w2",
    **fit_kw,
):
    """Single-chip dedup campaign: chunked historical emulation (HBM
    bounding at T = 1980), merged SSP emulation, production tail."""
    em = _em_jit(tuple(sorted(fit_kw.items())))
    tail = _tail_jit(weight_kind, sigma_mode)
    uh, um = jnp.asarray(pack.uh), jnp.asarray(pack.um)
    usb, usm = jnp.asarray(pack.usb), jnp.asarray(pack.usm)
    uidx, sidx = jnp.asarray(pack.uidx), jnp.asarray(pack.sidx)
    h_mu_u, h_var_u = chunked_marginals(em, uh, um, hist_chunk)
    s_mu_f, s_var_f = em(usb, usm)
    return tail(
        jnp.take(h_mu_u, uidx, axis=0),
        jnp.take(h_var_u, uidx, axis=0),
        jnp.take(s_mu_f, sidx, axis=0),
        jnp.take(s_var_f, sidx, axis=0),
        obs,
        jnp.asarray(pack.hb),
        jnp.asarray(pack.hm),
        jnp.asarray(pack.mmask),
    )


def make_sharded_dedup_campaign(
    mesh: Mesh,
    model_axis: str = "model",
    *,
    weight_kind: str = "crps",
    sigma_mode: str = "w2",
    **fit_kw,
):
    """The campaign's multi-chip form (VERDICT r3 item 5).

    Returns a jitted ``campaign(uh, um, usb, usm, uidx, sidx, obs, hb, hm,
    mmask) -> (bary_mean (S, T_ssp), bary_std, weights (S, M))``.  The
    unique-fit axes (``uh``/``usb`` leading dims) MUST be multiples of the
    mesh axis size — pad with :func:`pad_unique_axis` first.

    Sharding design: per-fit emulation has zero cross-fit coupling, so the
    emulation stage is a ``shard_map`` over the unique-fit axis with NO
    collectives — each of n devices runs ``U/n`` historical + ``B_ssp/n``
    SSP fits as ordinary device-local programs (including the Pallas
    kernels).  The ``(U, T)`` marginal outputs are then gathered into the
    ``(S, M, T)`` scenario layout inside the enclosing ``jit`` — XLA
    inserts one small all-gather (marginals are KB-scale; the (U, R, T)
    fit inputs never move) — and the weighting/barycentre tail's
    cross-model reductions compile to the usual collectives.  This is the
    program the BASELINE.md v5e-8 campaign estimate cites.
    """
    em = functools.partial(emulate_marginals, **fit_kw)
    p = P(model_axis)
    from jax import shard_map

    em_sh = shard_map(
        em,
        mesh=mesh,
        in_specs=(p, p),
        out_specs=(p, p),
        check_vma=False,
    )
    tail = functools.partial(
        multi_scenario_tail, weight_kind=weight_kind, sigma_mode=sigma_mode
    )

    def campaign(uh, um, usb, usm, uidx, sidx, obs, hb, hm, mmask):
        h_mu_u, h_var_u = em_sh(uh, um)
        s_mu_f, s_var_f = em_sh(usb, usm)
        return tail(
            jnp.take(h_mu_u, uidx, axis=0),
            jnp.take(h_var_u, uidx, axis=0),
            jnp.take(s_mu_f, sidx, axis=0),
            jnp.take(s_var_f, sidx, axis=0),
            obs,
            hb,
            hm,
            mmask,
        )

    return jax.jit(campaign)
