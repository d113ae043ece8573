"""GPDTW1D: the flagship emulator — DBA mean + heteroskedastic exact GP.

Capability match for the reference ``GPDTW1D``
(``/root/reference/ensembles/models.py:160-230``), whose pipeline is:
(a) DTW-barycentre of the realisations -> target mean ``y``
(b) across-realisation variance -> *known* per-point noise
(c) features ``X`` = the realisation matrix transposed (time-major)
(d) GPflow VGP, Matern-3/2, heteroskedastic likelihood
(e) 2000 alternating natgrad/Adam steps
(f) posterior ``predict_f(full_cov=True)`` + ``diag(y_var)``.

TPU-native re-design (see ops/gp.py for the math): because the likelihood's
noise is known, the VGP's optimum *is* exact GP regression, so steps (d)-(f)
collapse into Cholesky-based closed forms, and only the kernel hyperparameters
are optimised (Adam on the exact NLML).  The whole collection — every climate
model — fits as ONE jitted program: ``vmap`` over the model axis for DBA,
hyperparameter optimisation, and posterior extraction.  Ragged realisation
counts are zero-padded + masked (zero feature columns are distance-neutral).
"""

from __future__ import annotations

import contextlib
import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_ensembling_tpu.data import ModelCollection, Posterior, ProcessModel
from bayesian_ensembling_tpu.models.base import AbstractEmulator
from bayesian_ensembling_tpu.ops import gp as gp_ops
from bayesian_ensembling_tpu.ops.distributions import FullCovGaussian

__all__ = ["GPDTW1D", "emulate_batch", "emulate_batch_chunked"]


# Stages (a)-(c): DBA target mean, known noise, feature matrix — the shared
# preamble lives in ops/gp.prepare_gp_inputs (one owner for this module,
# parallel/step.emulate_marginals, and the warm-start benches).
_prepare_emulation = gp_ops.prepare_gp_inputs


@functools.partial(jax.jit, static_argnames=("kernel_name",))
def _posterior_with_noise(
    params, x, y_mean, y_var, kernel_name: str = "matern32", jitter: float = 1e-6
):
    """Stage (f): exact posterior + heteroskedastic noise diagonal."""
    kernel = gp_ops.get_kernel(kernel_name)
    post = functools.partial(gp_ops.posterior, kernel=kernel, jitter=jitter)
    mean, cov = jax.vmap(post)(params, x, y_mean, y_var)
    cov = cov + jax.vmap(jnp.diag)(y_var)
    return mean, cov


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_name", "n_optim_nits", "learning_rate", "dba_iterations",
        "dba_method", "dba_tol", "optimizer", "time_stride", "fine_steps",
        "return_params",
    ),
)
def emulate_batch(
    block: jnp.ndarray,  # (M, R, T) zero-padded realisations
    mask: jnp.ndarray,  # (M, R) validity
    kernel_name: str = "matern32",
    n_optim_nits: int = 500,
    learning_rate: float = 0.01,
    dba_iterations: int = 10,
    dba_method: str = "classic",
    dba_tol: tp.Optional[float] = None,
    jitter: float = 1e-6,
    optimizer: str = "adam",
    time_stride: int = 1,
    fine_steps: tp.Optional[int] = None,
    return_params: bool = False,
):
    """Fit every model's emulator in one compiled XLA program.

    Returns (mean (M,T), cov (M,T,T), nlml_trace) — the trace is
    (M, n_optim_nits) for the scratch fit, (M, n_optim_nits + fine_steps)
    for the warm-in-time fit (coarse NLMLs of the strided series followed
    by full-T fine NLMLs; not comparable across the boundary).
    ``return_params=True`` appends the fitted ``GPParams`` and the f32 DBA
    targets: (…, params, y_mean (M,T), y_var (M,T)) — the inputs the f64
    refinement consumes, returned from THIS fit so the refinement never
    re-runs the DBA preamble (refine_posterior_f64 ``targets=``).
    The covariance already includes the heteroskedastic noise diagonal, i.e.
    it is the posterior over *observables*, matching models.py:220.

    ``time_stride > 1`` runs the hyperparameter fit coarse-to-fine in time
    (ops/gp.fit_gp_batch_warm_time): ``n_optim_nits`` coarse steps on every
    ``time_stride``-th timestep, then ``fine_steps`` (required) warm-started
    steps at full T — the measured-better configuration at monthly
    resolution (benchmarks/monthly_warm_bench.py).
    """
    x, y_mean, y_var = _prepare_emulation(
        block, mask, dba_iterations=dba_iterations,
        dba_method=dba_method, dba_tol=dba_tol,
    )

    # (d)+(e) hyperparameter optimisation on the exact NLML — one batched
    # scan through the Pallas cholesky/solve kernels (ops/linalg_pallas.py).
    params, losses = gp_ops.fit_gp_batch_dispatch(
        x, y_mean, y_var,
        kernel_name=kernel_name,
        n_optim_nits=n_optim_nits,
        learning_rate=learning_rate,
        jitter=jitter,
        optimizer=optimizer,
        time_stride=time_stride,
        fine_steps=fine_steps,
    )

    mean, cov = _posterior_with_noise(
        params, x, y_mean, y_var, kernel_name=kernel_name, jitter=jitter
    )
    if return_params:
        return mean, cov, losses, params, y_mean, y_var
    return mean, cov, losses


def emulate_batch_chunked(
    block: jnp.ndarray,
    mask: jnp.ndarray,
    kernel_name: str = "matern32",
    n_optim_nits: int = 500,
    learning_rate: float = 0.01,
    dba_iterations: int = 10,
    dba_method: str = "classic",
    dba_tol: tp.Optional[float] = None,
    jitter: float = 1e-6,
    optimizer: str = "adam",
    fit_chunk_steps: int = 250,
    time_stride: int = 1,
    fine_steps: tp.Optional[int] = None,
    return_params: bool = False,
):
    """:func:`emulate_batch` staged as prepare → host-chunked fit → posterior.

    Same math, same step sequence, but the optimisation runs as a host loop
    of ``fit_chunk_steps``-long XLA executions (ops/gp.fit_gp_batch_chunked)
    instead of one merged program, so no single device execution exceeds a
    few tens of seconds — for environments that kill long executions (the
    tunnelled single-chip setup does, at minutes).  Prefer ``emulate_batch``
    when executions are unconstrained: the merged program saves the
    inter-stage HBM round-trips.  Same return contract, including the
    ``return_params=True`` (…, params, y_mean, y_var) extension.
    """
    x, y_mean, y_var = _prepare_emulation(
        block, mask, dba_iterations=dba_iterations,
        dba_method=dba_method, dba_tol=dba_tol,
    )
    params, losses = gp_ops.fit_gp_batch_dispatch(
        x, y_mean, y_var,
        kernel_name=kernel_name,
        n_optim_nits=n_optim_nits,
        learning_rate=learning_rate,
        jitter=jitter,
        optimizer=optimizer,
        time_stride=time_stride,
        fine_steps=fine_steps,
        chunk_steps=fit_chunk_steps,
    )
    mean, cov = _posterior_with_noise(
        params, x, y_mean, y_var, kernel_name=kernel_name, jitter=jitter
    )
    if return_params:
        return mean, cov, losses, params, y_mean, y_var
    return mean, cov, losses


def refine_posterior_f64(
    block: jnp.ndarray,  # (M, R, T)
    mask: jnp.ndarray,  # (M, R)
    params,  # GPParams with leading (M,) axis, f32-converged
    *,
    kernel_name: str = "matern32",
    dba_iterations: int = 10,
    dba_method: str = "classic",
    dba_tol: tp.Optional[float] = None,
    jitter: float = 1e-6,
    targets: tp.Optional[tp.Tuple[jnp.ndarray, jnp.ndarray]] = None,
    device: tp.Optional[str] = None,
):
    """Float64 posterior recompute at f32-converged hyperparameters.

    The full-covariance counterpart of
    ``parallel/step.refined_multi_scenario_f64``: keeps the fit in f32
    (where the speed is), then re-runs only stage (f) — gram, Cholesky,
    solves — in float64 with the f32 fit's hyperparameters and its f32 DBA
    targets unchanged, removing the f32 solve scatter (~2e-4 °C at the
    real workload's conditioning, BASELINE.md "Matched-hyperparameter
    parity") from the PUBLISHED moments.  XLA's TPU f64 is emulated but
    exact; emulated-f64 solves run ~2 orders slower than f32, so this is
    a final-artifact pass (seconds per collection), not an inner-loop one.

    ``targets``: the fit's own f32 ``(y_mean, y_var)`` (from
    ``emulate_batch(..., return_params=True)``) — bit-identical by
    construction and skips re-running the DBA dynamic program, the
    expensive part of the preamble at monthly T.  When omitted the
    targets are recomputed through the same jitted preamble.

    ``device="cpu"`` places the f64 pass on the host CPU backend, where
    f64 is native rather than emulated — measured 4.3x faster than the
    on-TPU pass for the 7-SSP workload (1.7 s vs 7.4 s steady,
    BASELINE.md); both are exact, the default keeps everything on the
    accelerator.

    Host-level entry point — enables x64 internally; do not call under an
    outer ``jit``.  Returns ``(mean (M,T), cov (M,T,T))`` as float64.
    """
    if targets is not None:
        y_mean, y_var = targets
        x = jnp.swapaxes(jnp.asarray(block), 1, 2)
        x, y_mean, y_var = (np.asarray(a) for a in (x, y_mean, y_var))
    else:
        prep = jax.jit(
            functools.partial(
                _prepare_emulation,
                dba_iterations=dba_iterations,
                dba_method=dba_method,
                dba_tol=dba_tol,
            )
        )
        # The f32 targets, recomputed through the fit's own preamble.
        x, y_mean, y_var = (np.asarray(a) for a in prep(block, mask))
    p_np = jax.tree_util.tree_map(np.asarray, params)
    with contextlib.ExitStack() as stack:
        stack.enter_context(jax.enable_x64())
        if device is not None:
            stack.enter_context(jax.default_device(jax.devices(device)[0]))
        p64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), p_np
        )
        mean, cov = _posterior_with_noise(
            p64,
            jnp.asarray(x, jnp.float64),
            jnp.asarray(y_mean, jnp.float64),
            jnp.asarray(y_var, jnp.float64),
            kernel_name=kernel_name,
            jitter=jitter,
        )
        return np.asarray(mean, np.float64), np.asarray(cov, np.float64)


class GPDTW1D(AbstractEmulator):
    """DBA-mean heteroskedastic GP emulator for 1-D (realisation, time) data.

    Defaults come from a typed :class:`~bayesian_ensembling_tpu.utils.config.
    GPRParameters` config (the reinstated reference config contract,
    SURVEY §5.6); explicit ``fit`` kwargs override it per call.
    """

    def __init__(
        self,
        name: str = "GPRegressor",
        kernel: tp.Optional[str] = None,
        dtype=jnp.float32,
        config: tp.Optional["GPRParameters"] = None,
    ) -> None:
        super().__init__(name)
        from bayesian_ensembling_tpu.utils.config import GPRParameters

        self.config = config or GPRParameters()
        self.kernel = kernel if kernel is not None else self.config.kernel
        self.dtype = dtype

    def fit_collection(
        self,
        collection: ModelCollection,
        n_optim_nits: tp.Optional[int] = None,
        learning_rate: tp.Optional[float] = None,
        dba_iterations: tp.Optional[int] = None,
        dba_method: tp.Optional[str] = None,
        dba_tol: tp.Optional[float] = None,
        jitter: tp.Optional[float] = None,
        optimizer: str = "adam",
        fit_chunk_steps: tp.Optional[int] = None,
        time_stride: int = 1,
        fine_steps: tp.Optional[int] = None,
        refine_f64: bool = False,
        refine_device: tp.Optional[str] = None,
        **_: tp.Any,
    ) -> tp.List[Posterior]:
        cfg = self.config
        n_optim_nits = cfg.n_optim_nits if n_optim_nits is None else n_optim_nits
        learning_rate = cfg.learning_rate if learning_rate is None else learning_rate
        dba_iterations = cfg.dba_iterations if dba_iterations is None else dba_iterations
        dba_method = (
            getattr(cfg, "dba_method", "classic")
            if dba_method is None
            else dba_method
        )
        jitter = getattr(cfg, "jitter", 1e-6) if jitter is None else jitter
        if collection[0].ndim > 2:
            raise NotImplementedError(
                "GPDTW1D handles (realisation, time) data only — use GPDTW3D "
                "for gridded fields (reference guard models.py:171-174)"
            )
        block, mask = collection.padded_stack(dtype=np.dtype(self.dtype))
        # `is not None` so fit_chunk_steps=0 reaches the chunked fit's loud
        # ValueError instead of silently running the unbounded merged fit.
        common = dict(
            kernel_name=self.kernel,
            n_optim_nits=n_optim_nits,
            learning_rate=learning_rate,
            dba_iterations=dba_iterations,
            dba_method=dba_method,
            dba_tol=dba_tol,
            jitter=jitter,
            optimizer=optimizer,
            time_stride=time_stride,
            fine_steps=fine_steps,
            return_params=refine_f64,
        )
        if fit_chunk_steps is not None:
            # Bounded-execution fit: host loop of fit_chunk_steps-long
            # segments instead of one merged program (same step sequence).
            out = emulate_batch_chunked(
                jnp.asarray(block), jnp.asarray(mask),
                fit_chunk_steps=fit_chunk_steps, **common,
            )
        else:
            out = emulate_batch(jnp.asarray(block), jnp.asarray(mask), **common)
        mean, cov = out[0], out[1]
        if refine_f64:
            # Published moments in f64 at the f32-converged hyperparameters
            # (removes the f32 solve scatter; see refine_posterior_f64).
            # The fit's own targets skip a second DBA pass.
            mean, cov = refine_posterior_f64(
                jnp.asarray(block), jnp.asarray(mask), out[3],
                kernel_name=self.kernel, dba_iterations=dba_iterations,
                dba_method=dba_method, dba_tol=dba_tol, jitter=jitter,
                targets=(out[4], out[5]), device=refine_device,
            )
        posts = []
        for i, pm in enumerate(collection):
            g = FullCovGaussian(mean=mean[i], cov=cov[i])
            posts.append(Posterior(gaussian=g, template=pm.blank_template()))
        return posts
