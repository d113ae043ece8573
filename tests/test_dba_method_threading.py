"""The dba_method/dba_tol knobs reach the mean-target stage on every surface.

The reference flagship's mean target is tslearn's SUBGRADIENT DBA
(``models.py:176-178``), while this framework's established workload-parity
convention is classic DBA-10 — both must be selectable through the fit
surfaces (ops/gp.prepare_gp_inputs → parallel/step → models/gp_dtw →
pipeline), and the choice must actually change the emulation target.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ensembling_tpu.ops import dtw as dtw_ops
from bayesian_ensembling_tpu.ops import gp as gp_ops


def _block(rng, m=2, r=4, t=20):
    base = np.sin(np.linspace(0, 3, t))
    block = (base + 0.3 * rng.normal(size=(m, r, t))).astype(np.float64)
    mask = np.ones((m, r), bool)
    return jnp.asarray(block), jnp.asarray(mask)


def test_prepare_gp_inputs_subgradient_matches_op(rng):
    block, mask = _block(rng)
    _, y_sub, _ = gp_ops.prepare_gp_inputs(
        block, mask, dba_iterations=5, dba_method="subgradient"
    )
    want = dtw_ops.dba_subgradient_batch(block, mask, max_iter=5, tol=1e-3)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(want), atol=1e-12)
    # And the classic default is untouched.
    _, y_cls, _ = gp_ops.prepare_gp_inputs(block, mask, dba_iterations=5)
    want_cls = dtw_ops.dba_batch(block, mask, n_iterations=5, init="mean")
    np.testing.assert_allclose(np.asarray(y_cls), np.asarray(want_cls), atol=1e-12)
    assert np.abs(np.asarray(y_sub) - np.asarray(y_cls)).max() > 1e-6


def test_prepare_gp_inputs_classic_tol_reaches_dba(rng):
    block, mask = _block(rng)
    _, y_tol, _ = gp_ops.prepare_gp_inputs(
        block, mask, dba_iterations=100, dba_tol=1e-10
    )
    want = dtw_ops.dba_batch(
        block, mask, n_iterations=100, init="mean", tol=1e-10
    )
    np.testing.assert_allclose(np.asarray(y_tol), np.asarray(want), atol=1e-12)


def test_prepare_gp_inputs_rejects_unknown_method(rng):
    block, mask = _block(rng)
    with pytest.raises(ValueError, match="dba_method"):
        gp_ops.prepare_gp_inputs(block, mask, dba_method="nope")


def test_emulate_marginals_threads_method(rng):
    from bayesian_ensembling_tpu.parallel.step import emulate_marginals

    block, mask = _block(rng)
    m_cls, _ = emulate_marginals(block, mask, n_optim_nits=3)
    m_sub, _ = emulate_marginals(
        block, mask, n_optim_nits=3, dba_method="subgradient", dba_iterations=5
    )
    assert np.abs(np.asarray(m_cls) - np.asarray(m_sub)).max() > 1e-8


def test_gpdtw1d_fit_collection_threads_method(rng):
    from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
    from bayesian_ensembling_tpu.coords import DimArray
    from bayesian_ensembling_tpu.models.gp_dtw import GPDTW1D

    t = 16
    time = np.arange(np.datetime64("2000-01"), np.datetime64("2000-01") + t)
    models = []
    for i in range(2):
        da = DimArray(
            rng.normal(size=(3, t)),
            dims=("realisation", "time"),
            coords={"realisation": np.arange(3), "time": time},
        )
        models.append(ProcessModel(da, f"m{i}"))
    coll = ModelCollection(models)
    posts_cls = GPDTW1D().fit_collection(coll, n_optim_nits=3)
    posts_sub = GPDTW1D().fit_collection(
        coll, n_optim_nits=3, dba_method="subgradient", dba_iterations=5
    )
    d = np.abs(
        np.asarray(posts_cls[0].gaussian.mean)
        - np.asarray(posts_sub[0].gaussian.mean)
    ).max()
    assert d > 1e-10


def test_config_validates_dba_method():
    from bayesian_ensembling_tpu.utils.config import GPRParameters

    cfg = GPRParameters(dba_method="subgradient", dba_iterations=50)
    assert cfg.dba_method == "subgradient"
    with pytest.raises(ValueError, match="dba_method"):
        GPRParameters(dba_method="mm")
