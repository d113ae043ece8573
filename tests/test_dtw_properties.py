"""Property-based invariants for the DTW/DBA kernels (hypothesis)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from bayesian_ensembling_tpu.ops import dtw as dtw_ops

floats = st.floats(min_value=-10.0, max_value=10.0, allow_nan=False, width=32)


def series_pair(min_t=3, max_t=24):
    return st.integers(min_t, max_t).flatmap(
        lambda t: st.tuples(
            st.lists(floats, min_size=t, max_size=t),
            st.lists(floats, min_size=t, max_size=t),
        )
    )


@settings(max_examples=25, deadline=None)
@given(series_pair())
def test_dtw_nonnegative_and_symmetric(pair):
    a, b = np.asarray(pair[0]), np.asarray(pair[1])
    d_ab = float(dtw_ops.squared_dtw(a, b))
    d_ba = float(dtw_ops.squared_dtw(b, a))
    assert d_ab >= -1e-9
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5, atol=1e-6)


@settings(max_examples=25, deadline=None)
@given(series_pair())
def test_dtw_identity_and_euclidean_bound(pair):
    a, b = np.asarray(pair[0]), np.asarray(pair[1])
    assert float(dtw_ops.squared_dtw(a, a)) <= 1e-9
    # DTW relaxes the alignment, so cost <= squared euclidean distance.
    assert float(dtw_ops.squared_dtw(a, b)) <= float(np.sum((a - b) ** 2)) + 1e-6


@settings(max_examples=15, deadline=None)
@given(
    st.integers(2, 5),
    st.integers(4, 16),
    st.integers(0, 10**6),
)
def test_dba_bounded_by_envelope(r, t, seed):
    rng = np.random.default_rng(seed)
    series = rng.normal(size=(r, t))
    center = np.asarray(dtw_ops.dba(series, n_iterations=3))
    # Every barycentre point is an average of series values, hence bounded.
    assert center.min() >= series.min() - 1e-6
    assert center.max() <= series.max() + 1e-6


@settings(max_examples=15, deadline=None)
@given(st.integers(3, 16), st.integers(0, 10**6))
def test_dba_shift_equivariance(t, seed):
    rng = np.random.default_rng(seed)
    series = rng.normal(size=(3, t))
    c0 = np.asarray(dtw_ops.dba(series, n_iterations=3))
    c1 = np.asarray(dtw_ops.dba(series + 5.0, n_iterations=3))
    np.testing.assert_allclose(c1, c0 + 5.0, rtol=1e-5, atol=1e-5)
