"""Sharded dedup campaign == single-chip dedup campaign (VERDICT r3 item 5).

The ~2.2 s v5e-8 native-monthly campaign estimate must be backed by runnable
code: ``parallel.campaign.make_sharded_dedup_campaign`` shards the
unique-fit axis over the mesh's model axis and must reproduce the
single-chip ``run_dedup_campaign`` (and hence the replicated layout, whose
equality with dedup is tested in test_parallel.py) exactly, on the virtual
8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bayesian_ensembling_tpu.coords import DimArray
from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
from bayesian_ensembling_tpu.parallel.campaign import (
    make_sharded_dedup_campaign,
    pack_dedup_campaign,
    pad_unique_axis,
    run_dedup_campaign,
)


def _scenarios(rng, t_h=14, t_s=8, r=3):
    time_h = (np.datetime64("2000-01", "M") + np.arange(t_h)).astype(
        "datetime64[ns]"
    )
    time_s = (np.datetime64("2010-01", "M") + np.arange(t_s)).astype(
        "datetime64[ns]"
    )

    def pm(name, t, time):
        vals = rng.normal(size=(r, t)).astype(np.float32)
        return ProcessModel(
            DimArray(vals, ("realisation", "time"), {"time": time}, name="tas"),
            name,
        )

    hist_pool = {n: pm(n, t_h, time_h) for n in ("a", "b", "c", "d", "e")}
    scenarios = []
    for si, names in enumerate((("a", "b", "c"), ("b", "c", "d"), ("c", "d", "e"))):
        hists = ModelCollection([hist_pool[n] for n in names])
        ssps = ModelCollection([pm(f"{n}{si}", t_s, time_s) for n in names])
        # SSP collections must carry the SAME model names as hist for the
        # campaign pack (names key the dedup) — rename.
        ssps = ModelCollection(
            [
                ProcessModel(
                    DimArray(
                        m.data.values, ("realisation", "time"),
                        {"time": time_s}, name="tas",
                    ),
                    n,
                )
                for m, n in zip(ssps, names)
            ]
        )
        scenarios.append((f"scn{si}", hists, ssps))
    obs = jnp.asarray(rng.normal(size=(4, t_h)).astype(np.float32))
    return scenarios, obs


@pytest.mark.parametrize("weight_kind", ["crps", "loglik"])
def test_sharded_campaign_matches_single_chip(rng, weight_kind):
    scenarios, obs = _scenarios(rng)
    pack = pack_dedup_campaign(scenarios)
    fit_kw = dict(n_optim_nits=3, dba_iterations=2)

    want = [
        np.asarray(a)
        for a in run_dedup_campaign(
            pack, obs, hist_chunk=5, weight_kind=weight_kind, **fit_kw
        )
    ]

    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "tests require the virtual 8-device CPU mesh"
    mesh = Mesh(devs, ("model",))
    campaign = make_sharded_dedup_campaign(
        mesh, weight_kind=weight_kind, **fit_kw
    )
    uh, um = pad_unique_axis(pack.uh, pack.um, 8)
    usb, usm = pad_unique_axis(pack.usb, pack.usm, 8)
    got = campaign(
        jnp.asarray(uh), jnp.asarray(um), jnp.asarray(usb), jnp.asarray(usm),
        jnp.asarray(pack.uidx), jnp.asarray(pack.sidx), obs,
        jnp.asarray(pack.hb), jnp.asarray(pack.hm), jnp.asarray(pack.mmask),
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-7)


def test_pad_unique_axis_replicates_real_rows(rng):
    block = rng.normal(size=(5, 3, 7))
    mask = rng.random(size=(5, 3)) > 0.3
    pb, pm_ = pad_unique_axis(block, mask, 8)
    assert pb.shape[0] == 8 and pm_.shape[0] == 8
    np.testing.assert_array_equal(pb[:5], block)
    np.testing.assert_array_equal(pb[5:], block[:3])
    np.testing.assert_array_equal(pm_[5:], mask[:3])
    # Already-aligned axes are returned untouched.
    pb2, _ = pad_unique_axis(block[:4], mask[:4], 2)
    assert pb2.shape[0] == 4


def test_campaign_pack_counts(rng):
    scenarios, _ = _scenarios(rng)
    pack = pack_dedup_campaign(scenarios)
    # 5 distinct historical models across 3 scenarios of 3; 9 real SSP rows.
    assert pack.uh.shape[0] == 5
    assert pack.usb.shape[0] == 9
    assert pack.n_fits == 14
    assert pack.uidx.max() == 4 and pack.sidx.max() == 8
