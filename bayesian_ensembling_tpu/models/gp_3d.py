"""GPDTW3D: spatiotemporal emulator for (realisation, time, lat, lon) fields.

Capability match for the reference ``GPDTW3D``
(``/root/reference/ensembles/models.py:233-424``), which runs a per-(lat,lon)
DBA double loop and then ONE sparse variational GP (400 inducing points,
minibatch 500) over unit-sphere + scaled-time features, returning a *diagonal*
posterior with the DTW variance added (models.py:408-423).

TPU-native re-design, two modes:

  * ``mode="batched"`` (default): every grid cell is an independent
    DBA + exact heteroskedastic GP over its own realisation features — the
    1-D flagship pipeline vmapped over (model x cell).  This is
    embarrassingly parallel, marginal-only (O(cells * T^2) memory), shards
    over a ``cells`` mesh axis, and is *more* faithful per cell than the
    reference's single global SVGP approximation (SURVEY SS7 item 7 blesses
    exactly this design).
  * ``mode="svgp"``: a JAX sparse variational GP on the reference's feature
    engineering (unit-sphere x,y,z + scaled continuous time + realisation
    columns, additive Matern-3/2 kernels — models.py:270-319,358-364) with
    whitened variational parameters and minibatched Adam.  This keeps the
    reference's model family available when a single joint spatiotemporal
    fit is wanted (see ops/svgp.py).

Both modes return a diagonal posterior over the flattened
(time, latitude, longitude) points, matching the reference contract.
"""

from __future__ import annotations

import functools
import typing as tp
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_ensembling_tpu.data import ModelCollection, Posterior, ProcessModel
from bayesian_ensembling_tpu.models.base import AbstractEmulator
from bayesian_ensembling_tpu.ops.distributions import DiagGaussian
from bayesian_ensembling_tpu.parallel.step import emulate_marginals

__all__ = ["GPDTW3D", "spherical_time_features"]


def _check_dims(pm: ProcessModel):
    if pm.ndim != 4:
        raise NotImplementedError(
            "GPDTW3D needs exactly (realisation, time, latitude, longitude) "
            "data (reference guard models.py:330-348)"
        )
    if pm.data.dims[2] != "latitude" or pm.data.dims[3] != "longitude":
        raise IndexError(
            "Coordinate order should be realisation, time, latitude, longitude"
        )


def spherical_time_features(
    lat: np.ndarray, lon: np.ndarray, n_time: int
) -> np.ndarray:
    """Unit-sphere embedding + scaled continuous time, flattened (N, 4).

    Mirrors the reference's feature engineering (models.py:277-292):
    x = cos(lat)cos(lon), y = cos(lat)sin(lon), z = sin(lat),
    t scaled to [-1, 1]; flattened in (time, lat, lon) order.
    """
    lat_r = np.deg2rad(lat)
    lon_r = np.deg2rad(lon)
    lon_g, lat_g = np.meshgrid(lon_r, lat_r)  # (La, Lo)
    x = np.cos(lat_g) * np.cos(lon_g)
    y = np.cos(lat_g) * np.sin(lon_g)
    z = np.sin(lat_g)
    t = np.arange(n_time, dtype=np.float64)
    t = 2.0 * t / max(t.max(), 1.0) - 1.0
    n_cells = x.size
    feats = np.empty((n_time * n_cells, 4))
    sp = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)  # (C, 3)
    feats[:, 0:3] = np.tile(sp, (n_time, 1))
    feats[:, 3] = np.repeat(t, n_cells)
    return feats


class GPDTW3D(AbstractEmulator):
    """Spatiotemporal DBA + GP emulator (batched-exact or SVGP mode)."""

    def __init__(
        self,
        name: str = "GP3DRegressor",
        mode: str = "batched",
        kernel: tp.Optional[str] = None,
        dtype=jnp.float32,
        config=None,
    ) -> None:
        super().__init__(name)
        from bayesian_ensembling_tpu.utils.config import GPRParameters, SGPRParameters

        self.config = config or (
            SGPRParameters()
            if mode == "svgp"
            else GPRParameters(kernel=kernel or "matern32")
        )
        self.mode = mode
        # Explicit kernel arg wins; otherwise honour config.kernel (same
        # contract as GPDTW1D — the typed-config layer drives defaults).
        self.kernel = kernel or getattr(self.config, "kernel", "matern32")
        self.dtype = dtype
        if mode == "svgp":
            warnings.warn(
                "GPDTW3D svgp mode is a joint approximation over all cells "
                "(reference semantics); batched mode is exact per cell."
            )

    # ----------------------------------------------------------- batched mode
    def _fit_batched(
        self,
        collection: ModelCollection,
        n_optim_nits: int,
        learning_rate: float,
        dba_iterations: int,
        jitter: float = 1e-6,
        dba_method: str = "classic",
        dba_tol: tp.Optional[float] = None,
        refine_f64: bool = False,
        refine_device: tp.Optional[str] = None,
        refine_cell_chunk: tp.Optional[int] = None,
    ) -> tp.List[Posterior]:
        posts = []
        for pm in collection:  # models may have different R; cells batch inside
            r, t, la, lo = pm.data.shape
            c = la * lo
            # (R, T, La, Lo) -> (C, R, T): every cell an independent problem.
            block = np.transpose(
                pm.data.values.reshape(r, t, c), (2, 0, 1)
            ).astype(np.dtype(self.dtype))
            mask = np.ones((c, r), dtype=bool)
            out = emulate_marginals(
                jnp.asarray(block),
                jnp.asarray(mask),
                kernel_name=self.kernel,
                n_optim_nits=n_optim_nits,
                learning_rate=learning_rate,
                dba_iterations=dba_iterations,
                dba_method=dba_method,
                dba_tol=dba_tol,
                jitter=jitter,
                return_params=refine_f64,
                return_targets=refine_f64,
            )  # (C, T) each
            mean, var = out[0], out[1]
            if refine_f64:
                # Published moments in f64 at the f32-converged
                # hyperparameters — removes the f32 solve scatter from the
                # gridded artifacts, the last surface still carrying it
                # (VERDICT r4; see parallel/gridded.refine_marginals_f64).
                from bayesian_ensembling_tpu.parallel.gridded import (
                    refine_marginals_f64,
                )

                chunk = refine_cell_chunk
                mean, var = refine_marginals_f64(
                    block, mask, out[2], (out[3], out[4]),
                    kernel_name=self.kernel, jitter=jitter,
                    device=refine_device, chunk=chunk,
                )
            # Back to flattened (time, lat, lon) order for the template.
            # Refined moments stay f64 numpy — jnp.asarray outside an x64
            # context would silently downcast them back to f32,
            # re-introducing exactly the scatter the refinement removed.
            mean_f = np.asarray(mean).T.reshape(-1)
            var_f = np.asarray(var).T.reshape(-1)
            if not refine_f64:
                mean_f, var_f = jnp.asarray(mean_f), jnp.asarray(var_f)
            posts.append(
                Posterior(
                    gaussian=DiagGaussian(mean=mean_f, var=var_f),
                    template=pm.blank_template(),
                )
            )
        return posts

    # -------------------------------------------------------------- svgp mode
    def _fit_svgp(
        self,
        collection: ModelCollection,
        n_optim_nits: int,
        learning_rate: float,
        dba_iterations: int,
        n_inducing: int,
        minibatch_size: int,
        dba_method: str = "classic",
        dba_tol: tp.Optional[float] = None,
    ) -> tp.List[Posterior]:
        from bayesian_ensembling_tpu.ops import svgp as svgp_ops
        from bayesian_ensembling_tpu.ops import dtw as dtw_ops

        posts = []
        for pm in collection:
            r, t, la, lo = pm.data.shape
            c = la * lo
            vals = pm.data.values.astype(np.dtype(self.dtype))
            cell_block = np.transpose(vals.reshape(r, t, c), (2, 0, 1))
            # Per-cell DBA mean + variance targets (models.py:238-268) via
            # the batched entry point: stable jit cache across models (a
            # fresh jit(vmap(...)) per model recompiled every iteration) and
            # the fused Pallas pairwise-cost path on TPU.
            if dba_method == "subgradient":
                # The variant the reference's 3-D emulator actually calls
                # per cell (models.py:251-253, max_iter=50 tol=1e-3).
                y_mean = np.asarray(
                    dtw_ops.dba_subgradient_batch(
                        jnp.asarray(cell_block),
                        jnp.ones((c, r), bool),
                        max_iter=dba_iterations,
                        tol=1e-3 if dba_tol is None else dba_tol,
                    )
                )
            else:
                y_mean = np.asarray(
                    dtw_ops.dba_batch(
                        jnp.asarray(cell_block),
                        jnp.ones((c, r), bool),
                        n_iterations=dba_iterations,
                        init="medoid",
                        tol=dba_tol,
                    )
                )  # (C, T)
            y_var = cell_block.var(axis=1)  # (C, T)
            y_mean_f = y_mean.T.reshape(-1)  # (T*C,) in (time, cell) order
            y_var_f = np.maximum(y_var.T.reshape(-1), 1e-8)

            feats = spherical_time_features(
                pm.data.get_coord("latitude"),
                pm.data.get_coord("longitude"),
                t,
            )
            # Realisation columns (models.py:298-306).
            real_cols = vals.reshape(r, t * c).T  # (T*C, R)
            x = np.concatenate([feats, real_cols], axis=1).astype(
                np.dtype(self.dtype)
            )

            # The reference runs n_optim_nits "epochs" of N//minibatch steps
            # (models.py:393); mirror those knob semantics.
            n_points = x.shape[0]
            total_steps = n_optim_nits * max(n_points // minibatch_size, 1)
            mean_f, var_f = svgp_ops.fit_predict_svgp(
                jnp.asarray(x),
                jnp.asarray(y_mean_f.astype(np.dtype(self.dtype))),
                jnp.asarray(y_var_f.astype(np.dtype(self.dtype))),
                n_inducing=n_inducing,
                minibatch_size=min(minibatch_size, n_points),
                n_optim_nits=total_steps,
                learning_rate=learning_rate,
            )
            var_out = np.asarray(var_f) + y_var_f  # add DTW variance (models.py:411)
            posts.append(
                Posterior(
                    gaussian=DiagGaussian(
                        mean=jnp.asarray(np.asarray(mean_f)),
                        var=jnp.asarray(var_out),
                    ),
                    template=pm.blank_template(),
                )
            )
        return posts

    def fit_collection(
        self,
        collection: ModelCollection,
        n_optim_nits: tp.Optional[int] = None,
        learning_rate: tp.Optional[float] = None,
        dba_iterations: tp.Optional[int] = None,
        dba_method: tp.Optional[str] = None,
        dba_tol: tp.Optional[float] = None,
        n_inducing: tp.Optional[int] = None,
        minibatch_size: tp.Optional[int] = None,
        jitter: tp.Optional[float] = None,
        refine_f64: bool = False,
        refine_device: tp.Optional[str] = None,
        refine_cell_chunk: tp.Optional[int] = None,
        **_: tp.Any,
    ) -> tp.List[Posterior]:
        cfg = self.config
        n_optim_nits = cfg.n_optim_nits if n_optim_nits is None else n_optim_nits
        learning_rate = cfg.learning_rate if learning_rate is None else learning_rate
        dba_iterations = (
            getattr(cfg, "dba_iterations", 10) if dba_iterations is None else dba_iterations
        )
        dba_method = (
            getattr(cfg, "dba_method", "classic")
            if dba_method is None
            else dba_method
        )
        n_inducing = getattr(cfg, "n_inducing", 400) if n_inducing is None else n_inducing
        minibatch_size = (
            getattr(cfg, "minibatch_size", 500) if minibatch_size is None else minibatch_size
        )
        jitter = getattr(cfg, "jitter", 1e-6) if jitter is None else jitter
        for pm in collection:
            _check_dims(pm)
        if self.mode == "batched":
            return self._fit_batched(
                collection, n_optim_nits, learning_rate, dba_iterations,
                jitter, dba_method=dba_method, dba_tol=dba_tol,
                refine_f64=refine_f64, refine_device=refine_device,
                refine_cell_chunk=refine_cell_chunk,
            )
        if refine_f64:
            raise ValueError(
                "refine_f64 applies to GPDTW3D batched mode only — the svgp "
                "mode's posterior is a variational approximation, so an f64 "
                "re-solve of its predictive equations would not remove "
                "approximation error, just solve scatter; fit in batched "
                "mode for refined moments"
            )
        if self.mode == "svgp":
            return self._fit_svgp(
                collection,
                n_optim_nits,
                learning_rate,
                dba_iterations,
                n_inducing,
                minibatch_size,
                dba_method=dba_method,
                dba_tol=dba_tol,
            )
        raise ValueError(f"unknown mode {self.mode!r}")
