"""Native C++ DTW/DBA engine vs the JAX wavefront kernels."""

import numpy as np
import pytest

from bayesian_ensembling_tpu import native
from bayesian_ensembling_tpu.ops import dtw as dtw_ops

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_native_sq_dtw_matches_jax(rng):
    a = rng.normal(size=40)
    b = rng.normal(size=40)
    got = native.squared_dtw(a, b)
    want = float(dtw_ops.squared_dtw(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_native_pairwise_matches_jax(rng):
    series = rng.normal(size=(5, 20))
    got = native.dtw_pairwise(series)
    want = np.asarray(dtw_ops.dtw_pairwise_sq(series))
    np.testing.assert_allclose(got, want, rtol=1e-10)
    assert np.allclose(got, got.T)


def test_native_dba_matches_jax(rng):
    series = rng.normal(size=(4, 24)) + np.sin(np.linspace(0, 3, 24))
    got = native.dba(series, n_iterations=5)
    want = np.asarray(dtw_ops.dba(series, n_iterations=5))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_native_dba_constant(rng):
    series = np.tile(np.linspace(0, 1, 15), (3, 1))
    out = native.dba(series, n_iterations=3)
    np.testing.assert_allclose(out, series[0], atol=1e-12)


def test_native_dba_batch_matches_per_model(rng):
    """bet_dba_batch (OpenMP over models) == per-model bet_dba exactly."""
    if not native.available():
        pytest.skip("native library unavailable")
    s = rng.normal(size=(5, 4, 30))
    batch = native.dba_batch(s, n_iterations=4)
    solo = np.stack([native.dba(s[i], n_iterations=4) for i in range(5)])
    np.testing.assert_allclose(batch, solo, rtol=1e-14)
