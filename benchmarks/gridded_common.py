"""Shared workload definition for the gridded benchmark and its CPU oracle.

Both ``gridded_bench.py`` (TPU f32) and ``gridded_oracle.py`` (CPU f64) build
the exact same synthetic CMIP6-scale gridded dataset from the same seed and
run the same fused per-cell pipeline, so their posterior moments are directly
comparable pointwise (BASELINE.json parity demand; VERDICT r1 item 1 noted
the gridded path had no oracle at all).
"""

import numpy as np

M, R, T, R_OBS = 5, 10, 86, 10
SEED = 0


def make_workload_cells(cell_indices, dtype=np.float32):
    """Deterministic synthetic data for an arbitrary set of flat cell ids.

    Every cell's data comes from its own counter-based substream keyed on
    the FLAT cell id, so any subset of cells (the oracle's first-N, the
    warm-start path's strided coarse cells) reproduces exactly the same
    arrays regardless of which other cells are generated alongside.
    """
    cell_indices = np.asarray(cell_indices)
    signal = np.sin(np.linspace(0, 3, T))
    block = np.empty((M, cell_indices.size, R, T), dtype=dtype)
    obs = np.empty((cell_indices.size, R_OBS, T), dtype=dtype)
    for i, c in enumerate(cell_indices):
        rng = np.random.default_rng(SEED + 1000 + int(c))
        block[:, i] = signal + 0.3 * rng.normal(size=(M, R, T))
        obs[i] = signal + 0.3 * rng.normal(size=(R_OBS, T))
    return block, obs


def make_workload(n_cells: int, dtype=np.float32):
    """First-``n_cells`` convenience wrapper over ``make_workload_cells``."""
    return make_workload_cells(np.arange(n_cells), dtype)


def make_workload_cached(n_cells: int, dtype=np.float32, cache_dir=None,
                         gen_chunk: int = 8192):
    """Disk-cached ``make_workload``: memory-mapped, generated once.

    At 0.25° (1,036,800 cells) the workload is ~21 GB and its per-cell
    counter-based generation costs ~11 minutes of host time — far more
    than the streamed benchmark run it feeds.  This wrapper materialises
    the exact ``make_workload`` arrays into ``.npy`` files under
    ``benchmarks/.workload_cache/`` (git-ignored) one ``gen_chunk`` of
    cells at a time (bounded RAM), then returns read-only memmaps; cache
    hits open instantly.  The ``--stream`` bench slices slabs straight off
    these memmaps, so the OS page cache + the staging pipeline overlap the
    disk reads with TPU compute.

    Identical bytes to ``make_workload`` by construction (same per-cell
    substreams); a small-n equality test locks that in
    (tests/test_gridded_bench_slab.py).
    """
    if dtype != np.float32:
        return make_workload(n_cells, dtype)  # cache keyed for f32 only
    import os

    cache_dir = cache_dir or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".workload_cache"
    )
    tag = f"c{n_cells}_m{M}r{R}t{T}ro{R_OBS}_seed{SEED}"
    bpath = os.path.join(cache_dir, f"block_{tag}.npy")
    opath = os.path.join(cache_dir, f"obs_{tag}.npy")
    if not (os.path.exists(bpath) and os.path.exists(opath)):
        os.makedirs(cache_dir, exist_ok=True)
        # Write under temp names + rename so a killed generation never
        # leaves a half-written cache that later runs trust.
        btmp, otmp = bpath + f".tmp{os.getpid()}", opath + f".tmp{os.getpid()}"
        bmm = np.lib.format.open_memmap(
            btmp, mode="w+", dtype=np.float32, shape=(M, n_cells, R, T)
        )
        omm = np.lib.format.open_memmap(
            otmp, mode="w+", dtype=np.float32, shape=(n_cells, R_OBS, T)
        )
        import sys
        import time

        t0 = time.perf_counter()
        for lo in range(0, n_cells, gen_chunk):
            hi = min(lo + gen_chunk, n_cells)
            b, o = make_workload_cells(np.arange(lo, hi))
            bmm[:, lo:hi] = b
            omm[lo:hi] = o
            if lo and lo % (gen_chunk * 16) == 0:
                done = hi / n_cells
                eta = (time.perf_counter() - t0) * (1 - done) / done
                print(
                    f"workload cache: {hi}/{n_cells} cells "
                    f"({100 * done:.0f}%, eta {eta:.0f}s)",
                    file=sys.stderr,
                )
        bmm.flush()
        omm.flush()
        del bmm, omm
        os.replace(btmp, bpath)
        os.replace(otmp, opath)
    return (
        np.load(bpath, mmap_mode="r"),
        np.load(opath, mmap_mode="r"),
    )


def coarse_params_for(cell_indices, lat, lon, stride, n_iters, dtype=np.float32,
                      optimizer="adam"):
    """Warm-start ``GPParams`` for ``cell_indices`` via the coarse-grid fit.

    Fits ONLY the coarse cells that serve the requested fine cells (each
    (model, cell) fit is independent, so fitting a subset of the coarse
    grid gives bit-identical params to fitting all of it) and returns the
    batched params gathered per fine cell — the shape
    ``gridded_ensemble_step(gp_init=...)`` expects.  Shared by the TPU
    bench (all cells) and the CPU float64 oracle (its first-N subset) so
    both run the identical coarse-to-fine algorithm.
    """
    import jax
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.parallel.gridded import (
        coarse_cell_indices,
        coarse_fit_params,
    )

    cell_indices = np.asarray(cell_indices)
    coarse, nearest = coarse_cell_indices(lat, lon, stride)
    need = np.unique(nearest[cell_indices])
    cblock, _ = make_workload_cells(coarse[need], dtype)
    m, nc, r, t = cblock.shape
    params = coarse_fit_params(
        jnp.asarray(cblock.reshape(m * nc, r, t)),
        jnp.ones((m * nc, r), bool),
        n_optim_nits=n_iters,
        optimizer=optimizer,
    )
    params = jax.tree.map(lambda p: np.asarray(p).reshape(m, nc), params)
    pos = {int(v): i for i, v in enumerate(need)}
    sel = np.array([pos[int(v)] for v in nearest[cell_indices]])
    return jax.tree.map(lambda p: p[:, sel], params)


def gridded_experiment(blocks, obs, n_iters: int, gp_init=None,
                       optimizer: str = "adam", return_fit: bool = False):
    """(M,C,R,T) blocks + (C,R_obs,T) obs -> per-cell barycentre moments.

    Thin wrapper over the LIBRARY's gridded pipeline
    (parallel/gridded.gridded_ensemble_step, weight_kind="crps") so the
    benchmark and its CPU oracle validate exactly the code path users run.
    ``gp_init``: optional (M, C)-batched GPParams (the coarse-to-fine warm
    start, ``coarse_params_for``).
    Returns (bary_mean (C,T), bary_std (C,T), w (M,C)); with
    ``return_fit`` additionally (params (M,C), y_mean (M,C,T),
    y_var (M,C,T)) — the f64 refinement's inputs (``--refine-f64``).
    """
    import jax.numpy as jnp

    from bayesian_ensembling_tpu.parallel.gridded import gridded_ensemble_step

    m, c, r, _ = blocks.shape
    return gridded_ensemble_step(
        jnp.asarray(blocks),
        jnp.asarray(obs),
        jnp.ones((m, c, r), bool),
        n_optim_nits=n_iters,
        gp_init=gp_init,
        optimizer=optimizer,
        return_fit=return_fit,
    )


# One entry per configuration lives in each oracle JSON.  Legacy entries
# predate some keys, so both the oracle writer's dedup and the bench's
# entry selection must compare under the SAME defaults — otherwise
# regenerating a legacy configuration keeps the stale entry, which the
# bench then silently prefers.
ORACLE_KEY_DEFAULTS = {
    "warm_stride": 0,
    "fine_nits": None,
    "lat": None,
    "lon": None,
    "optimizer": "adam",
}


def oracle_entry_key(entry):
    """Canonical identity of an oracle entry's fit configuration."""
    return tuple(
        entry.get(k, ORACLE_KEY_DEFAULTS.get(k))
        for k in ("n_optim_nits", "n_cells", "warm_stride", "fine_nits",
                  "lat", "lon", "optimizer")
    )


def replace_oracle_entry(entries, new_entry):
    """Drop any entry with ``new_entry``'s configuration, append the new one."""
    kept = [e for e in entries if oracle_entry_key(e) != oracle_entry_key(new_entry)]
    kept.append(new_entry)
    return kept
