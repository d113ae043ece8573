"""Tracing / profiling seams.

The reference's only progress visibility is tqdm bars and periodic loss
prints (SURVEY SS5.1).  Here:

  * :func:`trace` wraps ``jax.profiler.trace`` so any pipeline stage can dump
    a TensorBoard-compatible device trace;
  * :class:`StepTimer` gives wall-clock stage timings with a reliable device
    sync (the tunnelled TPU backend only synchronises on host fetches);
  * ``progress_callback`` is the seam emulators call every K optimisation
    steps (loss logging without host round-trips inside jit — the trace is
    returned by the fitted scan and reported after the fact).
"""

from __future__ import annotations

import contextlib
import time
import typing as tp

import jax
import numpy as np

__all__ = ["trace", "StepTimer", "device_sync", "report_loss_trace"]


def device_sync(tree: tp.Any) -> None:
    """Synchronise by fetching one element of every leaf to host.

    ``jax.block_until_ready`` is unreliable on the tunnelled TPU backend;
    a device-to-host copy is the portable sync point.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "shape"):
            # Slice ON DEVICE before the host copy — np.asarray(leaf) would
            # transfer the whole array, so timing big pytrees measured
            # device->host bandwidth instead of compute.
            first = leaf.ravel()[:1] if getattr(leaf, "size", 1) else leaf
            np.asarray(first)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bet_trace"):
    """Capture a jax.profiler device trace around a block."""
    with jax.profiler.trace(log_dir):
        yield log_dir


class StepTimer:
    """Named wall-clock stage timings with device sync."""

    def __init__(self) -> None:
        self.timings: tp.Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync: tp.Any = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            device_sync(sync)
        self.timings[name] = self.timings.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.3f}s" for k, v in self.timings.items())


def report_loss_trace(
    losses,
    every: int = 25,
    printer: tp.Callable[[str], None] = print,
    label: str = "loss",
) -> None:
    """Post-hoc loss logging (replaces the reference's in-loop prints at
    models.py:211-215 — inside jit there are no hosts to print from)."""
    arr = np.asarray(losses)
    if arr.ndim == 1:
        arr = arr[None]
    for step in range(0, arr.shape[-1], every):
        printer(f"step {step}: {label} = {arr[..., step].mean():.4f}")
