"""GPDTW3D (batched + svgp modes) and SVGP op tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from bayesian_ensembling_tpu.coords import DimArray
from bayesian_ensembling_tpu.data import ModelCollection, ProcessModel
from bayesian_ensembling_tpu.models.gp_3d import GPDTW3D, spherical_time_features
from bayesian_ensembling_tpu.ops import svgp as svgp_ops


def make_gridded(rng, r=3, t=12, la=3, lo=4, start="2000-01"):
    time = (
        np.datetime64(start, "M") + np.arange(t)
    ).astype("datetime64[ns]")
    lat = np.linspace(-60, 60, la)
    lon = np.linspace(0, 270, lo)
    base = np.sin(np.linspace(0, 2, t))[None, :, None, None]
    vals = base + 0.1 * rng.normal(size=(r, t, la, lo))
    da = DimArray(
        vals,
        ("realisation", "time", "latitude", "longitude"),
        {"time": time, "latitude": lat, "longitude": lon},
        name="tas",
    )
    return ProcessModel(da, "gridded")


def test_spherical_features():
    feats = spherical_time_features(np.array([0.0, 90.0]), np.array([0.0, 180.0]), 3)
    assert feats.shape == (3 * 4, 4)
    # lat=0, lon=0 -> x=1, y=0, z=0
    np.testing.assert_allclose(feats[0, :3], [1, 0, 0], atol=1e-12)
    # lat=90 -> z=1
    np.testing.assert_allclose(feats[2, 2], 1.0, atol=1e-12)
    # time scaled to [-1, 1]
    assert feats[0, 3] == -1.0 and feats[-1, 3] == 1.0


def test_gpdtw3d_requires_4d(rng):
    from test_data import make_da

    pm = ProcessModel(make_da(rng), "m")
    with pytest.raises(NotImplementedError):
        GPDTW3D().fit(pm, n_optim_nits=2)


def test_gpdtw3d_dim_order(rng):
    pm = make_gridded(rng)
    bad = DimArray(
        np.transpose(pm.data.values, (0, 2, 1, 3)),
        ("realisation", "latitude", "time", "longitude"),
        {},
    )
    # Constructing a ProcessModel with time not in dim 1 already fails.
    with pytest.raises(ValueError):
        ProcessModel(bad, "bad")


def test_gpdtw3d_batched(rng):
    pm = make_gridded(rng)
    post = GPDTW3D(dtype=np.float64).fit(pm, n_optim_nits=15, dba_iterations=2)
    n = 12 * 3 * 4
    assert np.asarray(post.gaussian.mean).shape == (n,)
    assert (np.asarray(post.gaussian.var) > 0).all()
    assert post.mean.dims == ("time", "latitude", "longitude")
    # Mean field should roughly track the shared seasonal signal.
    mean_t = post.mean.values.mean(axis=(1, 2))
    signal = np.sin(np.linspace(0, 2, 12))
    assert np.corrcoef(mean_t, signal)[0, 1] > 0.9


def test_gpdtw3d_batched_cellwise_matches_1d(rng):
    """Each cell of the batched 3-D fit must equal the 1-D fit of that cell."""
    from bayesian_ensembling_tpu.parallel.step import emulate_marginals

    pm = make_gridded(rng, r=2, t=10, la=2, lo=2)
    post = GPDTW3D(dtype=np.float64).fit(pm, n_optim_nits=10, dba_iterations=2)
    vals = pm.data.values  # (R, T, La, Lo)
    cell = vals[:, :, 1, 0]  # (R, T)
    mean_c, var_c = emulate_marginals(
        jnp.asarray(cell[None].astype(np.float64)),
        jnp.ones((1, 2), bool),
        n_optim_nits=10,
        dba_iterations=2,
    )
    got_mean = post.mean.values[:, 1, 0]
    np.testing.assert_allclose(got_mean, np.asarray(mean_c[0]), rtol=1e-6)


def test_svgp_fits_simple_function(rng):
    n = 300
    x = np.zeros((n, 5))
    x[:, 3] = np.linspace(-1, 1, n)  # time feature carries the signal
    x[:, 0] = 1.0
    x[:, 4] = rng.normal(size=n) * 0.01
    y = np.sin(3 * x[:, 3])
    noise = np.full(n, 0.01)
    mean, var = svgp_ops.fit_predict_svgp(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(noise),
        n_inducing=40, minibatch_size=64, n_optim_nits=400, learning_rate=0.02,
    )
    mean = np.asarray(mean)
    rmse = np.sqrt(np.mean((mean - y) ** 2))
    assert rmse < 0.25, rmse
    assert (np.asarray(var) > 0).all()


def test_svgp_chunked_scan_matches_monolithic(rng):
    # The host-chunked optimisation (bounded execution times on the
    # tunnelled backend) must draw the same minibatch sequence and land on
    # the same posterior as a single-chunk run: the PRNG folds ABSOLUTE
    # step indices.
    n = 120
    x = rng.normal(size=(n, 5)).astype(np.float32)
    y = rng.normal(size=n).astype(np.float32)
    noise = np.full(n, 0.05, np.float32)
    kw = dict(n_inducing=12, minibatch_size=32, n_optim_nits=25,
              learning_rate=0.02)
    mean_a, var_a = svgp_ops.fit_predict_svgp(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(noise),
        chunk_steps=10_000, **kw,
    )
    mean_b, var_b = svgp_ops.fit_predict_svgp(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(noise),
        chunk_steps=7, **kw,
    )
    np.testing.assert_allclose(np.asarray(mean_a), np.asarray(mean_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_a), np.asarray(var_b),
                               rtol=1e-5, atol=1e-7)


def test_svgp_loss_trace(rng):
    # return_losses exposes the full per-step neg-ELBO trace across chunks
    # (the progress/observability seam for reference-scale runs).
    n = 150
    x = rng.normal(size=(n, 5)).astype(np.float32)
    y = (0.5 * x[:, 3]).astype(np.float32)
    noise = np.full(n, 0.05, np.float32)
    mean, var, losses = svgp_ops.fit_predict_svgp(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(noise),
        n_inducing=12, minibatch_size=32, n_optim_nits=120,
        learning_rate=0.02, chunk_steps=50, return_losses=True,
    )
    assert losses.shape == (120,)
    assert np.isfinite(losses).all()
    # Optimisation makes progress: late loss below early loss.
    assert losses[-20:].mean() < losses[:20].mean()


def test_gpdtw3d_svgp_mode(rng):
    pm = make_gridded(rng, r=2, t=8, la=2, lo=3)
    with pytest.warns(UserWarning, match="svgp"):
        model = GPDTW3D(mode="svgp", dtype=np.float64)
    post = model.fit(
        pm, n_optim_nits=60, dba_iterations=2, n_inducing=16, minibatch_size=24
    )
    n = 8 * 2 * 3
    assert np.asarray(post.gaussian.mean).shape == (n,)
    assert np.isfinite(np.asarray(post.gaussian.mean)).all()
    # Posterior variance includes the DTW variance floor.
    y_var = pm.data.values.var(axis=0).reshape(-1)
    assert (np.asarray(post.gaussian.var) >= y_var * 0.99).all()


def test_default_feature_groups_rejects_narrow_layouts():
    """The reference grouping assumes >= 4 feature columns (xy, z, time);
    fewer used to silently gather out of bounds (JAX clamps indices)."""
    import pytest

    with pytest.raises(ValueError, match="4 features"):
        svgp_ops.default_feature_groups(3)
    assert svgp_ops.default_feature_groups(4) == ((0, 1), (2,), (3,))
    assert svgp_ops.default_feature_groups(6) == ((0, 1), (2,), (3,), (4, 5))
