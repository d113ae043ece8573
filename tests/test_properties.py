"""Property-based invariants (hypothesis) for the combination/scoring ops.

Complements the example-based oracles: these assert MATHEMATICAL properties
that must hold for every input — metric axioms for the Gaussian W2 distance,
convexity/permutation invariance for the barycentre modes, and the classic
CRPS properties (nonnegativity, minimisation at the observation, the exact
value at sigma->0).  Reference semantics: wasserstein.py:21-100,
weights.py:469-513 in /root/reference/ensembles.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from bayesian_ensembling_tpu.ops import scoring
from bayesian_ensembling_tpu.ops import wasserstein as ws

_settings = settings(max_examples=25, deadline=None)


def _gaussians(n):
    """(means, stds) strategy: n-member 1-D Gaussian families."""
    finite = st.floats(-5.0, 5.0, allow_nan=False)
    pos = st.floats(0.05, 4.0, allow_nan=False)
    return st.tuples(
        st.lists(finite, min_size=n, max_size=n).map(np.asarray),
        st.lists(pos, min_size=n, max_size=n).map(np.asarray),
    )


def _weights(n):
    return (
        st.lists(st.floats(0.01, 1.0, allow_nan=False), min_size=n, max_size=n)
        .map(np.asarray)
        .map(lambda w: w / w.sum())
    )


@_settings
@given(_gaussians(2), _gaussians(2))
def test_w2_diag_metric_axioms(g1, g2):
    """Symmetry, nonnegativity, and identity of indiscernibles for the
    textbook (squared_mean_gap) diagonal W2."""
    (m1, s1), (m2, s2) = g1, g2
    v1, v2 = s1**2, s2**2
    d12 = float(ws.gaussian_w2_distance_diag(m1, v1, m2, v2, squared_mean_gap=True))
    d21 = float(ws.gaussian_w2_distance_diag(m2, v2, m1, v1, squared_mean_gap=True))
    assert d12 >= -1e-9
    np.testing.assert_allclose(d12, d21, rtol=1e-5, atol=1e-7)
    d11 = float(ws.gaussian_w2_distance_diag(m1, v1, m1, v1, squared_mean_gap=True))
    assert abs(d11) < 1e-6


@_settings
@given(_gaussians(2), _gaussians(2), _gaussians(2))
def test_w2_diag_triangle_inequality(g1, g2, g3):
    """sqrt(W2^2) is a metric: d(1,3) <= d(1,2) + d(2,3)."""

    def d(a, b):
        w2sq = ws.gaussian_w2_distance_diag(
            a[0], a[1] ** 2, b[0], b[1] ** 2, squared_mean_gap=True
        )
        return float(jnp.sqrt(jnp.maximum(w2sq, 0.0)))

    assert d(g1, g3) <= d(g1, g2) + d(g2, g3) + 1e-6


@_settings
@given(_gaussians(5), _weights(5), st.permutations(list(range(5))))
def test_barycentre_permutation_invariance(g, w, perm):
    """Relabelling members (with their weights) must not change the result,
    for every sigma mode."""
    means, stds = g
    p = np.asarray(perm)
    for mode in ("w2", "mixture"):
        mu_a, sig_a = ws.batched_gaussian_barycentre(
            jnp.asarray(means[:, None]),
            jnp.asarray(stds[:, None]),
            jnp.asarray(w[:, None]),
            sigma_mode=mode,
        )
        mu_b, sig_b = ws.batched_gaussian_barycentre(
            jnp.asarray(means[p][:, None]),
            jnp.asarray(stds[p][:, None]),
            jnp.asarray(w[p][:, None]),
            sigma_mode=mode,
        )
        np.testing.assert_allclose(float(mu_a[0]), float(mu_b[0]), rtol=1e-5)
        np.testing.assert_allclose(float(sig_a[0]), float(sig_b[0]), rtol=1e-5)


@_settings
@given(_gaussians(4), _weights(4))
def test_barycentre_convexity_bounds(g, w):
    """The W2 barycentre mean/sigma are convex combinations: they live inside
    the members' hull.  The mixture sigma dominates the W2 sigma
    (Cauchy-Schwarz plus the nonnegative spread term)."""
    means, stds = g
    mu, sig = ws.batched_gaussian_barycentre(
        jnp.asarray(means[:, None]), jnp.asarray(stds[:, None]), jnp.asarray(w[:, None])
    )
    assert means.min() - 1e-6 <= float(mu[0]) <= means.max() + 1e-6
    assert stds.min() - 1e-6 <= float(sig[0]) <= stds.max() + 1e-6
    _, sig_mix = ws.batched_gaussian_barycentre(
        jnp.asarray(means[:, None]),
        jnp.asarray(stds[:, None]),
        jnp.asarray(w[:, None]),
        sigma_mode="mixture",
    )
    assert float(sig_mix[0]) >= float(sig[0]) - 1e-6


@_settings
@given(
    st.floats(-5.0, 5.0, allow_nan=False),
    st.floats(-5.0, 5.0, allow_nan=False),
    st.floats(0.05, 4.0, allow_nan=False),
)
def test_crps_properties(obs, mu, sigma):
    """Gaussian CRPS: nonnegative; minimised over mu at the observation;
    sigma->0 limit is |obs - mu| (the deterministic-forecast MAE)."""
    c = float(scoring.gaussian_crps(jnp.float64(obs), jnp.float64(mu), jnp.float64(sigma)))
    assert c >= -1e-12
    c_at_obs = float(
        scoring.gaussian_crps(jnp.float64(obs), jnp.float64(obs), jnp.float64(sigma))
    )
    assert c_at_obs <= c + 1e-9
    c_sharp = float(
        scoring.gaussian_crps(jnp.float64(obs), jnp.float64(mu), jnp.float64(1e-9))
    )
    np.testing.assert_allclose(c_sharp, abs(obs - mu), atol=1e-6)


@_settings
@given(
    # Epoch anywhere in [1700, 2200) at second resolution — including epochs
    # OUTSIDE the datetime64[ns] span (pre-1678 handled by a separate test).
    st.integers(min_value=-8_520_336_000, max_value=7_258_118_400),
    st.sampled_from(["seconds", "minutes", "hours", "days"]),
    st.lists(
        st.integers(min_value=0, max_value=20_000), min_size=1, max_size=8, unique=True
    ).map(sorted),
)
def test_cf_time_decode_matches_integer_arithmetic(epoch_s, unit, offsets):
    """decode_cf_time on integer offsets equals exact datetime64 arithmetic,
    for every CF unit and any second-resolution epoch in [1700, 2200)."""
    from bayesian_ensembling_tpu.io import timeutils

    epoch = np.datetime64(0, "s") + np.timedelta64(int(epoch_s), "s")
    step = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400}[unit]
    want = (
        epoch.astype("datetime64[us]")
        + np.asarray(offsets, np.int64) * np.timedelta64(step * 10**6, "us")
    )
    lo = np.datetime64("1678-01-01")
    hi = np.datetime64("2262-01-01")
    units = f"{unit} since {np.datetime_as_string(epoch, unit='s').replace('T', ' ')}"
    if want.min() < lo or want.max() > hi:
        return  # decoded range outside ns span is a separate (raising) test
    got = timeutils.decode_cf_time(np.asarray(offsets, np.float64), units)
    np.testing.assert_array_equal(got, want.astype("datetime64[ns]"))


@_settings
@given(
    st.integers(min_value=0, max_value=2**33),  # seconds offset into ns span
    st.sampled_from(["s", "m", "h", "D"]),
    st.lists(
        st.integers(min_value=0, max_value=5_000), min_size=2, max_size=6, unique=True
    ).map(sorted),
)
def test_netcdf_time_roundtrip_exact(start_s, res, offsets):
    """save_dataarray -> open_dataarray round-trips ANY datetime64 time
    coordinate exactly (the writer must pick a CF unit that represents the
    offsets exactly, whatever their resolution)."""
    import os
    import tempfile

    from bayesian_ensembling_tpu.coords import DimArray
    from bayesian_ensembling_tpu.io import netcdf

    base = np.datetime64("1700-01-01", "ns") + np.timedelta64(int(start_s), "s")
    time = base + np.asarray(offsets, np.int64) * np.timedelta64(1, res).astype(
        "timedelta64[ns]"
    )
    vals = np.arange(2 * len(time), dtype=np.float64).reshape(2, len(time))
    da = DimArray(vals, ("realisation", "time"), {"time": time}, name="tas")
    fd, p = tempfile.mkstemp(suffix=".nc")
    os.close(fd)
    try:
        netcdf.save_dataarray(p, da)
        back = netcdf.open_dataarray(p)
    finally:
        os.remove(p)
    np.testing.assert_array_equal(back.time, time)
    np.testing.assert_array_equal(back.values, vals)


@_settings
@given(
    st.lists(st.floats(-3.0, 3.0, allow_nan=False), min_size=2, max_size=12).map(
        np.asarray
    ),
    st.floats(-3.0, 3.0, allow_nan=False),
    st.floats(0.1, 3.0, allow_nan=False),
)
def test_diag_log_likelihood_is_gaussian_logpdf(obs, mu, sigma):
    """diag_log_likelihood equals the pointwise normal logpdf."""
    var = sigma**2
    got = np.asarray(
        scoring.diag_log_likelihood(
            jnp.full(obs.shape, mu, dtype=jnp.float64),
            jnp.full(obs.shape, var, dtype=jnp.float64),
            jnp.asarray(obs, dtype=jnp.float64),
        )
    )
    want = -0.5 * np.log(2 * np.pi * var) - 0.5 * (obs - mu) ** 2 / var
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)
