"""The sharded surfaces must place EXACTLY the collectives the math needs.

The reference's only cross-model couplings are the weight-normalisation
sum (weights.py:123,511) and the barycentre weighted sums
(wasserstein.py:86,98); the fused sharded steps express them as psums (+ a
pmax underflow guard for loglik, + all-gathers for the pairwise similarity
weighters).  These counts are read from the pre-optimisation StableHLO of
the actual jitted programs — a regression here means a new collective
crept into (or fell out of) the hot path.  Payload-scale evidence lives in
benchmarks/collective_audit.py / collective_audit.json (VERDICT r4
item 3).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"
    ),
)

from collective_audit import lowered_counts  # noqa: E402


def _mesh1d():
    return Mesh(np.array(jax.devices()[:8]), axis_names=("model",))


def _annual_args(m=16, r=4, t_hist=24, t_ssp=12):
    rng = np.random.default_rng(0)
    hb = rng.normal(size=(m, r, t_hist)).astype(np.float32)
    sb = rng.normal(size=(m, r, t_ssp)).astype(np.float32)
    obs = rng.normal(size=(r, t_hist)).astype(np.float32)
    return (
        jnp.asarray(hb), jnp.ones((m, r), jnp.float32),
        jnp.asarray(sb), jnp.ones((m, r), jnp.float32),
        jnp.asarray(obs), jnp.ones((m,), jnp.float32),
    )


@pytest.mark.parametrize(
    "weight_kind,sigma_mode,want",
    [
        # weight-normalisation psum + barycentre mean/std psums.
        ("crps", "w2", {"all_reduce": 3, "all_gather": 0}),
        # mixture variance needs the global mean first; still 3 psums.
        ("crps", "mixture", {"all_reduce": 3, "all_gather": 0}),
        # + the pmax underflow guard (itself an all_reduce).
        ("loglik", "w2", {"all_reduce": 4, "all_gather": 0}),
        # pairwise couplings: marginal moments + mask all-gathered.
        ("similarity", "w2", {"all_reduce": 3, "all_gather": 3}),
        ("similarity_single", "w2", {"all_reduce": 3, "all_gather": 3}),
    ],
)
def test_sharded_step_collective_inventory(weight_kind, sigma_mode, want):
    from bayesian_ensembling_tpu.parallel.step import make_sharded_step

    step = make_sharded_step(
        _mesh1d(), n_optim_nits=2, dba_iterations=2,
        weight_kind=weight_kind, sigma_mode=sigma_mode,
    )
    got = lowered_counts(step.lower(*_annual_args()).as_text())
    for k, v in want.items():
        assert got[k] == v, (k, got)
    assert got["reduce_scatter"] == 0
    assert got["collective_permute"] == 0
    assert got["all_to_all"] == 0


def test_multi_scenario_step_collective_inventory():
    from bayesian_ensembling_tpu.parallel.step import (
        make_sharded_multi_scenario_step,
    )

    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4),
        axis_names=("scenario", "model"),
    )
    step = make_sharded_multi_scenario_step(
        mesh, n_optim_nits=2, dba_iterations=2,
        weight_kind="crps", sigma_mode="w2",
    )
    hb, hm, sb, sm, obs, mm = _annual_args()
    s = 2
    args = (
        jnp.broadcast_to(hb[None], (s,) + hb.shape),
        jnp.broadcast_to(hm[None], (s,) + hm.shape),
        jnp.broadcast_to(sb[None], (s,) + sb.shape),
        jnp.broadcast_to(sm[None], (s,) + sm.shape),
        obs,
        jnp.broadcast_to(mm[None], (s,) + mm.shape),
    )
    got = lowered_counts(step.lower(*args).as_text())
    # The scenario axis is collective-free data parallelism: the same 3
    # model-axis psums, nothing over 'scenario'.
    assert got["all_reduce"] == 3
    assert got["all_gather"] == 0


def test_gridded_step_collective_inventory():
    from bayesian_ensembling_tpu.parallel.gridded import (
        make_sharded_gridded_step,
    )

    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(4, 2),
        axis_names=("model", "cells"),
    )
    step = make_sharded_gridded_step(
        mesh, n_optim_nits=2, dba_iterations=2, weight_kind="crps"
    )
    rng = np.random.default_rng(1)
    c, r, t = 8, 4, 16
    args = (
        jnp.asarray(rng.normal(size=(4, c, r, t)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(c, r, t)).astype(np.float32)),
        jnp.ones((4, c, r), jnp.float32),
        jnp.ones((4,), jnp.float32),
    )
    got = lowered_counts(step.lower(*args).as_text())
    # Cells = collective-free DP; models couple at the same 3 psums.
    assert got["all_reduce"] == 3
    assert got["all_gather"] == 0


def test_cells_shard_is_collective_free():
    from bayesian_ensembling_tpu.parallel.gridded import (
        _sharded_marginals_program,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("cells",))
    program = _sharded_marginals_program(
        mesh, "cells", tuple(sorted({"n_optim_nits": 2,
                                     "dba_iterations": 2}.items()))
    )
    rng = np.random.default_rng(2)
    block = jnp.asarray(rng.normal(size=(8, 4, 16)).astype(np.float32))
    mask = jnp.ones((8, 4), bool)
    got = lowered_counts(program.lower(block, mask).as_text())
    assert all(v == 0 for v in got.values()), got
