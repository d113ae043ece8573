"""Gate <-> sizing consistency for every Pallas kernel family (VERDICT r2
item 4).

The invariant: for every problem size a dispatch gate admits, the lane
chunk the sizer picks must fit the SAME budget the gate used, and that
budget must sit under the hardware scoped-VMEM limit.  This is the bug
class that bit the DBA kernels at mid-range T when sizing and gating used
different constants — the sweep covers the full admissible T range for all
four kernel families (fused DBA, split DBA, DTW cost, batched linalg).

Pure arithmetic — no TPU, no compilation.
"""

import numpy as np
import pytest

from bayesian_ensembling_tpu.ops import vmem
from bayesian_ensembling_tpu.ops import dtw_pallas as dp
from bayesian_ensembling_tpu.ops import linalg_pallas as lp


def test_budgets_under_hardware_limit():
    assert vmem.SCOPED_VMEM_BUDGET <= vmem.SCOPED_VMEM_LIMIT
    assert vmem.LINALG_BUDGET <= vmem.SCOPED_VMEM_LIMIT
    # The linalg budget models only the main buffer; its headroom for the
    # un-modelled (T, lanes) vectors must be real.
    assert vmem.SCOPED_VMEM_LIMIT - vmem.LINALG_BUDGET >= 2**21


@pytest.mark.parametrize("t", list(range(2, 3300, 7)) + [1700, 1980, 2800])
def test_dba_gate_implies_chunk_fits(t):
    """Every T the fused/split gates admit gets a lane width that fits."""
    tp_ = -(-t // 32) * 32
    for fits, bpe in (
        (dp.fused_dba_fits, dp._DBA_BYTES_PER_ELEM),
        (dp.split_dba_fits, dp._DBA_SPLIT_BYTES_PER_ELEM),
    ):
        if not fits(t):
            continue
        for requested in (128, 1024, 4096):
            for n in (1, 100, 10_000):
                lanes = dp._lanes_for(tp_, bpe, requested, n)
                assert lanes >= 128 and lanes % 128 == 0
                assert lanes * tp_ * bpe <= vmem.SCOPED_VMEM_BUDGET


@pytest.mark.parametrize("t", list(range(2, 5400, 11)))
def test_dtw_cost_gate_implies_chunk_fits(t):
    t_pad = -(-t // 8) * 8
    if not dp.dtw_cost_fits(t):
        return
    bpe = dp._dtw_cost_bytes_per_elem(t_pad)
    for requested in (128, 2048):
        lanes = dp._lanes_for(t_pad, bpe, requested, 10_000)
        assert lanes * t_pad * bpe <= vmem.SCOPED_VMEM_BUDGET


# Mosaic's measured scoped allocation for the cost kernel at T=1980 with a
# 2-chunk grid: 16.47 MiB at 256 lanes = 34.0 B per (row, lane) element.
# With grid > 1 Pallas double-buffers the VMEM input blocks, so the model
# constant must cover 2x2 input buffers + 2 scratch carries + Mosaic's
# stack temporaries — a 24 B model (statics only, no double-buffering)
# admitted that exact 256-lane chunk and overflowed the 16 MiB limit by
# 480 KB (round-3 regression, caught on real hardware).
#
# The stack term GROWS with T (second round-3 hardware sweep): 49.1 B/elem
# measured at T=3000 AND T=3500 with 128-lane 2-chunk grids (the 36 B model
# admitted both; they OOM'd at 17.98 / 20.90 MiB), and 41.4 B/elem at
# T=4528 grid=1 (no input double-buffering).  Round 4 then refuted the
# cheap low-T regime itself: 49.4 B/elem demanded at (T=1032, 384 lanes,
# grid=2) inside the subgradient-DBA epoch loop (18.67 MiB, OOM by
# 2.67 MiB on the real compiler) — so ONE conservative multi-chunk
# constant (>= every measured point) now covers all T.
_MEASURED_COST_BYTES_MULTICHUNK = 34           # T=1980, 256 lanes
_MEASURED_COST_BYTES_MULTICHUNK_MID = 49.4     # T=1032, 384 lanes (round 4)
_MEASURED_COST_BYTES_MULTICHUNK_LARGE = 49.1   # T=3000/3500, 128 lanes
_MEASURED_COST_BYTES_GRID1_LARGE = 41.4        # T=4528, grid=1


def test_dtw_cost_model_covers_measured_points():
    for measured in (
        _MEASURED_COST_BYTES_MULTICHUNK,
        _MEASURED_COST_BYTES_MULTICHUNK_MID,
        _MEASURED_COST_BYTES_MULTICHUNK_LARGE,
    ):
        assert dp._DTW_COST_BYTES_PER_ELEM >= measured
    assert dp._DTW_COST_BYTES_PER_ELEM_SINGLE >= _MEASURED_COST_BYTES_GRID1_LARGE
    # The round-4 OOM config (T=1032, batch 768) must now be sized at
    # <= 256 lanes: 49.4 B/elem at 256 lanes = 13.1 MiB fits scoped VMEM.
    lanes = dp._lanes_for(1032, dp._dtw_cost_bytes_per_elem(1032), 2048, 768)
    assert lanes <= 256
    assert lanes * 1032 * _MEASURED_COST_BYTES_MULTICHUNK_MID <= vmem.SCOPED_VMEM_BUDGET
    # The exact configs that OOM'd under the 36 B model are still rejected.
    assert not dp.dtw_cost_fits(3000)
    assert not dp.dtw_cost_fits(3500)
    # Hardware-verified boundary decisions stay pinned: T=2536/n=256
    # (multi-chunk ceiling) and T=3016/n=128 (grid-1 ceiling) compiled, ran,
    # and matched the scan oracle; the next multiples of 8 are rejected.
    assert dp.dtw_cost_fits(2536)
    assert not dp.dtw_cost_fits(2544) and not dp.dtw_cost_fits(2544, n=256)
    assert dp.dtw_cost_fits(3016, n=128)
    assert not dp.dtw_cost_fits(3024, n=128)


@pytest.mark.parametrize("t", list(range(2200, 3400, 11)) + [2536, 2544, 3016, 3024])
def test_dtw_cost_grid1_rescue_fits(t):
    """Past the multi-chunk ceiling, batches that fit ONE chunk are still
    admitted — at a lane width whose un-double-buffered working set fits the
    budget — and larger batches are rejected consistently."""
    t_pad = -(-t // 8) * 8
    multi = vmem.fits_min_chunk(
        t_pad * dp._dtw_cost_bytes_per_elem(t_pad), vmem.SCOPED_VMEM_BUDGET
    )
    for n in (1, 64, 128, 129, 400):
        admitted = dp.dtw_cost_fits(t, n=n)
        lanes = dp._single_chunk_lanes(t_pad, n)
        if multi:
            assert admitted
            continue
        assert admitted == (lanes is not None)
        if lanes is not None:
            n_pad = max(-(-n // vmem.LANE_QUANTUM) * vmem.LANE_QUANTUM,
                        vmem.LANE_QUANTUM)
            assert lanes == n_pad  # grid == 1: the whole batch in one chunk
            assert (lanes * t_pad * dp._DTW_COST_BYTES_PER_ELEM_SINGLE
                    <= vmem.SCOPED_VMEM_BUDGET)
    # n unknown -> the conservative multi-chunk answer only.
    assert dp.dtw_cost_fits(t) == multi


def test_dtw_cost_model_covers_double_buffering():
    assert dp._DTW_COST_BYTES_PER_ELEM >= _MEASURED_COST_BYTES_MULTICHUNK
    # The exact configuration that OOM'd: T=1980, N=384, default request.
    t_pad = -(-1980 // 8) * 8
    lanes = dp._lanes_for(t_pad, dp._DTW_COST_BYTES_PER_ELEM, 2048, 384)
    assert lanes * t_pad * _MEASURED_COST_BYTES_MULTICHUNK <= vmem.SCOPED_VMEM_LIMIT


@pytest.mark.parametrize("t", list(range(2, 260)))
def test_linalg_gate_implies_chunk_fits(t):
    """linalg_path('tpu') admitting T means _max_lanes(T)'s buffer fits the
    SAME budget (previously: 14 MiB gate vs an unrelated 12 MiB sizer).

    The cost model must be the PADDED (T8, T8, lanes) buffer the kernels
    actually allocate — modelling t*t8 once undersized small T by up to
    16/9 and picked chunks past the 16 MiB hardware limit (e.g. T=12 drew
    19,072 lanes = 18.6 MiB)."""
    sub = -(-t // 8) * 8
    admitted = vmem.fits_min_chunk(sub * sub * 4, vmem.LINALG_BUDGET)
    assert admitted == (lp.linalg_path(t, backend="tpu") == "pallas")
    lanes = lp._max_lanes(t)
    assert lanes >= 128 and lanes % 128 == 0
    if admitted:
        assert lanes * sub * sub * 4 <= vmem.LINALG_BUDGET
        assert lanes * sub * sub * 4 <= vmem.SCOPED_VMEM_LIMIT
    # The production annual case must stay on the Pallas path.
    if t == 165:
        assert admitted


def test_medoid_cost_dispatch_window_exists():
    """The split-DBA gate admits T the cost kernel cannot take (the cost
    ceiling ~2500 sits below split's ~2880), so dba_batch's medoid init
    carries its own cost dispatch (ops/dtw.py) — hardware-verified at
    T=2600 (b=1, r=17: scan-path medoid costs + Pallas split update)."""
    assert dp.split_dba_fits(2600)
    assert not dp.dtw_cost_fits(2600, n=17 * 16 // 2)


def test_annual_config_unchanged():
    """The headline configs keep their historical dispatch decisions."""
    assert dp.fused_dba_fits(165) and dp.fused_dba_fits(1032)
    assert not dp.fused_dba_fits(1980)
    assert dp.split_dba_fits(1980)
    assert not dp.split_dba_fits(3200)
    assert dp.dtw_cost_fits(1980)
    assert lp.linalg_path(165, backend="tpu") == "pallas"
    assert lp.linalg_path(1032, backend="tpu", b=112) == "blocked"
    assert lp.linalg_path(1032, backend="tpu") == "xla"  # b=None: no blocked impl
    assert lp.linalg_path(1980, backend="tpu") == "xla"
