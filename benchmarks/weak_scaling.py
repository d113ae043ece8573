"""Weak-scaling measurement for the cells-sharded gridded pipeline.

VERDICT r1 item 7 asked the v5e-8 gridded estimate to be backed by a
measurement instead of a bare division by 8.  Two measurements:

1. **Virtual-mesh sanity** (CPU, ``--xla_force_host_platform_device_count``):
   fixed per-device cell count, mesh grown 1→2→4→8 devices.  All virtual
   devices share ONE physical CPU, so total runtime necessarily grows with
   total work — the check is that it grows at most ~linearly (the sharding
   layer and its zero collectives add no superlinear coupling).  This
   validates the *program*, not the silicon; the slab mode estimates real
   scaling.
2. **Single-chip slab timing** (TPU): the full grid C vs the per-device slab
   C/8 on the real chip.  time(C/8 slab) is what each of 8 chips would run
   concurrently — a much better v5e-8 estimate than time(C)/8 because it
   includes the fixed per-program overheads that do NOT shrink with C.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/weak_scaling.py mesh
  python benchmarks/weak_scaling.py slab [n_optim_nits]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import gridded_common as gc


def sync(tree):
    from bayesian_ensembling_tpu.utils.profiling import device_sync

    device_sync(tree)


def run_mesh():
    # Mirror tests/conftest.py: the tunnelled TPU plugin ignores
    # JAX_PLATFORMS, so pin the platform through the config API and make
    # sure the virtual-device flag is present before jax initialises.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from bayesian_ensembling_tpu.parallel.gridded import (
        pad_cells,
        sharded_gridded_marginals,
    )

    per_dev_cells, n_iters = 16, 50
    results = {}
    for nd in (1, 2, 4, 8):
        if nd > len(jax.devices()):
            break
        c = per_dev_cells * nd
        block, _ = gc.make_workload(c, dtype=np.float32)
        # flatten (M, C) -> cells axis for the cells-sharded entry point
        flat = block.transpose(1, 0, 2, 3).reshape(c * gc.M, gc.R, gc.T)
        mask = np.ones((c * gc.M, gc.R), bool)
        mesh = Mesh(np.array(jax.devices()[:nd]), axis_names=("cells",))
        pb, pm, orig = pad_cells(flat, mask, nd)
        t0 = time.perf_counter()
        out = sharded_gridded_marginals(
            mesh, jnp.asarray(pb), jnp.asarray(pm), n_optim_nits=n_iters
        )
        sync(out)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = sharded_gridded_marginals(
            mesh, jnp.asarray(pb), jnp.asarray(pm), n_optim_nits=n_iters
        )
        sync(out)
        results[nd] = round(time.perf_counter() - t0, 3)
        print(f"devices={nd} cells={c}: {results[nd]}s (warmup {warm:.1f}s)", file=sys.stderr)
    base = results[1]
    print(json.dumps({
        "mode": "virtual_mesh_weak_scaling",
        "per_device_cells": per_dev_cells,
        "seconds_by_devices": results,
        # null, not a fake 1.0, when the 8-device configuration never ran.
        "weak_scaling_efficiency_8dev": (
            round(base / results[8], 3) if 8 in results else None
        ),
    }))


def run_slab():
    import jax
    import jax.numpy as jnp

    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    la, lo = 36, 72
    c_full = la * lo
    c_slab = c_full // 8
    out = {}
    for label, c in (("full_grid", c_full), ("one_eighth_slab", c_slab)):
        block, obs = gc.make_workload(c, dtype=np.float32)
        step = jax.jit(lambda b, o: gc.gridded_experiment(b, o, n_iters))
        b_j, o_j = jnp.asarray(block), jnp.asarray(obs)
        sync(step(b_j, o_j))  # warmup/compile
        t0 = time.perf_counter()
        sync(step(b_j, o_j))
        out[label] = round(time.perf_counter() - t0, 3)
        print(f"{label}: {c} cells -> {out[label]}s", file=sys.stderr)
    print(json.dumps({
        "mode": "single_chip_slab",
        "n_optim_nits": n_iters,
        "seconds": out,
        "v5e8_estimate_seconds": out["one_eighth_slab"],
        "naive_div8_seconds": round(out["full_grid"] / 8, 3),
    }))


if __name__ == "__main__":
    {"mesh": run_mesh, "slab": run_slab}[sys.argv[1]]()
