"""Persistent XLA compilation cache management (VERDICT r2 item 1).

Time-to-first-result on the tunnelled TPU backend is dominated by XLA
compilation of the big fused programs (tens of seconds to minutes for the
merged 7-scenario bench program).  JAX's persistent compilation cache
serialises compiled executables to disk keyed by HLO hash, so every entry
point that re-runs an identical program (bench re-runs, experiment CLIs,
the serve builder, campaign scripts) pays compilation ONCE per machine
instead of once per process.

Measured through this repo's tunnelled v5e backend (probe program, one
chip): first compile 62.7 s cold -> 2.2 s in a fresh process with a warm
cache.  The cache works across processes and survives restarts; entries
are invalidated automatically when the program, jax version, or backend
changes (the hash covers all three).  Two caveats measured on this
environment (BASELINE.md "Time-to-first-result"): cache keys are stable
per launch command but differ between launch harnesses (direct script vs
runpy/exec wrappers), and on a contended shared chip the remaining warmup
(session init + executable upload + first execution) can still dominate
wall-clock regardless of cache hits.

Call :func:`enable_persistent_cache` early — before the first ``jit``
trace — from CLI entry points.  It is deliberately NOT called at package
import: libraries should not write to disk as an import side effect, and
test suites (CPU, interpret-mode) neither need nor want it.

Env overrides:
  * ``BET_COMPILE_CACHE`` — cache directory (default
    ``~/.cache/bayesian_ensembling_tpu/xla``).
  * ``BET_COMPILE_CACHE=0`` / ``off`` / ``none`` — disable entirely.
"""

from __future__ import annotations

import os
import typing as tp

__all__ = ["enable_persistent_cache"]

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "bayesian_ensembling_tpu", "xla"
)
_enabled_dir: tp.Optional[str] = None


def enable_persistent_cache(cache_dir: tp.Optional[str] = None) -> tp.Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir`` (idempotent).

    Returns the cache directory in use, or None when disabled via
    ``BET_COMPILE_CACHE=0`` or an unwritable directory (the caller keeps
    working — compilation just stays per-process).
    """
    global _enabled_dir
    if _enabled_dir is not None:
        return _enabled_dir
    env = os.environ.get("BET_COMPILE_CACHE")
    if env is not None and env.lower() in ("0", "off", "none", "false"):
        return None
    # The env var overrides in BOTH directions (the docstring's contract):
    # an operator's BET_COMPILE_CACHE path beats a caller's explicit
    # cache_dir argument, just as the =0 spelling beats it.
    cache_dir = env or cache_dir or _DEFAULT
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # Per-process probe name: concurrent launches racing on a shared
        # fixed name made the loser's os.remove raise and silently disable
        # its cache.
        probe = os.path.join(cache_dir, f".writable.{os.getpid()}")
        with open(probe, "w"):
            pass
        try:
            os.remove(probe)
        except FileNotFoundError:
            pass
    except OSError:
        return None

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every compilation that took >= 1 s — the big fused programs are
    # minutes; tiny helper jits stay out of the cache (and off the disk).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled_dir = cache_dir
    return cache_dir
