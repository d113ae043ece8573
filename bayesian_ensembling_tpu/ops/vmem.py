"""Single source of truth for Pallas scoped-VMEM budgeting (one module, two
kernel families).

TPU v5e gives each Pallas kernel instance 16 MiB of scoped VMEM.  Every
kernel family in this package must size its lane chunks AND gate its
dispatch with the SAME constants, so that any problem size a dispatch gate
admits is guaranteed a chunk width whose working set actually fits.  (The
bug class this prevents is real: the DBA kernels once sized chunks against
a 12 MiB heuristic while their gate admitted sizes against a different
figure, and mid-range T drew lane widths the gate's own arithmetic would
have rejected — an opaque Mosaic VMEM error instead of a fallback.)

Two budgets, one invariant:

* ``SCOPED_VMEM_BUDGET`` (~15.5 MiB) — for kernels whose per-lane byte cost
  was *measured end to end* (every VMEM consumer: in/out buffers, loop
  carries, staging).  The DTW/DBA family's 76/44/24 B-per-element constants
  are such measurements (ops/dtw_pallas.py), so they may run close to the
  hardware limit.
* ``LINALG_BUDGET`` (14 MiB) — for kernels whose cost model counts only the
  dominant ``(T, T, lanes)`` f32 buffer (ops/linalg_pallas.py); the 2 MiB
  headroom covers the un-modelled ``(T, lanes)`` vector outputs and DMA
  staging slices.

The invariant — enforced by ``tests/test_vmem_budget.py`` across the whole
admissible T range — is: *gate admits ⇒ the chunk the sizer picks fits the
family budget, and the family budget ≤ the hardware limit.*
"""

from __future__ import annotations

import typing as tp

__all__ = [
    "SCOPED_VMEM_LIMIT",
    "SCOPED_VMEM_BUDGET",
    "LINALG_BUDGET",
    "LANE_QUANTUM",
    "max_lane_chunk",
    "fits_min_chunk",
]

# The hardware scoped-VMEM ceiling per kernel instance (v5e).
SCOPED_VMEM_LIMIT = 16 * 2**20

# Working budget for fully-measured per-lane cost models (DTW/DBA family).
SCOPED_VMEM_BUDGET = 15 * 2**20 + 2**19  # ~15.5 MiB

# Working budget for the batched-linalg family, whose per-lane model counts
# only the main (T, T, lanes) buffer.
LINALG_BUDGET = 14 * 2**20

# TPU vector lanes — chunk widths are always a multiple of this.
LANE_QUANTUM = 128


def max_lane_chunk(
    bytes_per_lane: int,
    budget: int,
    requested: tp.Optional[int] = None,
    n: tp.Optional[int] = None,
) -> int:
    """Largest ``LANE_QUANTUM``-multiple lane chunk fitting ``budget``.

    ``bytes_per_lane`` is the kernel's full VMEM cost of ONE batch lane
    (e.g. ``T_pad * bytes_per_elem`` for the DTW kernels, ``T * T_sub * 4``
    for batched linalg).  Floors at one quantum (128): callers must gate
    with :func:`fits_min_chunk` using the SAME budget before trusting the
    result.  ``requested`` caps the chunk at a caller preference; ``n`` caps
    it at the batch size rounded up to a quantum.
    """
    fit = max(budget // max(bytes_per_lane, 1) // LANE_QUANTUM * LANE_QUANTUM,
              LANE_QUANTUM)
    if requested is not None:
        fit = min(fit, max(requested // LANE_QUANTUM * LANE_QUANTUM, LANE_QUANTUM))
    if n is not None:
        fit = min(fit, max(-(-n // LANE_QUANTUM) * LANE_QUANTUM, LANE_QUANTUM))
    return fit


def fits_min_chunk(bytes_per_lane: int, budget: int) -> bool:
    """Dispatch gate: does the minimum (128-lane) chunk fit ``budget``?

    Using the same ``budget`` here and in :func:`max_lane_chunk` is what
    makes the gate and the sizer consistent by construction.
    """
    return LANE_QUANTUM * bytes_per_lane <= budget
