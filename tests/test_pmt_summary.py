"""The PMT campaign aggregator (benchmarks/pmt_summary.py) must reproduce
hand-computed win counts from the CSV contract (reference utils.py:192)."""

import os
import sys

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"),
)


def _write_campaign(tmp_path, wname, ssp, bary_nll, mmm_nll):
    d = tmp_path / ssp / "csvs"
    d.mkdir(parents=True)
    df = pd.DataFrame(
        {
            "model as pseudo obs": ["m1", "m2"],
            f"nll_bary_{wname.removesuffix('_plus_sim')}": bary_nll,
            f"rmse_bary_{wname.removesuffix('_plus_sim')}": [0.5, 0.6],
            f"w2_bary_{wname.removesuffix('_plus_sim')}": [1.0, 1.2],
            "nll_mmm": mmm_nll,
            "rmse_mmm": [0.7, 0.7],
            "w2_mmm": [2.0, 2.0],
        }
    )
    df.to_csv(d / f"perfect_model_test_results_{wname}_{ssp}.csv")


def test_summary_win_counts(tmp_path):
    from pmt_summary import summarise

    _write_campaign(tmp_path, "UniformWeight", "ssp119", [1.0, 1.0], [2.0, 2.0])
    _write_campaign(tmp_path, "CRPSWeight", "ssp245", [3.0, 3.0], [2.0, 2.0])
    df = summarise(str(tmp_path))
    assert len(df) == 2
    by = df.set_index("weighter")
    assert bool(by.loc["UniformWeight", "nll_bary_wins"]) is True
    assert bool(by.loc["CRPSWeight", "nll_bary_wins"]) is False
    # bary beats mmm on rmse and w2 in both rows
    assert df["rmse_bary_wins"].all() and df["w2_bary_wins"].all()


def test_summary_plus_sim_naming(tmp_path):
    """Include-sim campaigns suffix the FILE name but not the columns."""
    from pmt_summary import summarise

    _write_campaign(
        tmp_path, "UniformWeight_plus_sim", "ssp119", [1.0, 1.0], [2.0, 2.0]
    )
    df = summarise(str(tmp_path))
    assert len(df) == 1 and df.iloc[0]["weighter"] == "UniformWeight_plus_sim"
    assert bool(df.iloc[0]["nll_bary_wins"]) is True


def test_sign_test_p_exact():
    """Exact two-sided binomial sign test: hand values + scipy oracle when
    available, symmetry, edge cases."""
    from pmt_summary import sign_test_p

    assert np.isnan(sign_test_p(0, 0))
    assert sign_test_p(1, 1) == pytest.approx(1.0)
    assert sign_test_p(5, 10) == pytest.approx(1.0)
    # P(X=0) + P(X=10) for n=10: 2 * 2^-10
    assert sign_test_p(10, 10) == pytest.approx(2 * 0.5**10)
    assert sign_test_p(7, 10) == pytest.approx(0.34375)  # minlike two-sided
    assert sign_test_p(3, 10) == pytest.approx(sign_test_p(7, 10))
    scipy_stats = pytest.importorskip("scipy.stats")
    for n in (5, 13, 65, 325):
        for wins in (0, 1, n // 3, n // 2, n - 1, n):
            assert sign_test_p(wins, n) == pytest.approx(
                scipy_stats.binomtest(wins, n).pvalue, rel=1e-10
            ), (wins, n)


def test_summary_fold_level_columns(tmp_path):
    """Fold-level win counts count strict per-fold wins, excluding ties —
    the unit the sign test runs on (one outlier fold can flip the
    fold-MEAN cell verdict; the fold counts are the robust view)."""
    from pmt_summary import summarise

    # Fold 1: bary wins (1 < 2); fold 2: tie (2 == 2).  Fold-mean says
    # bary wins (1.5 < 2.0); fold level says 1 win of 1 comparable.
    _write_campaign(tmp_path, "UniformWeight", "ssp119", [1.0, 2.0], [2.0, 2.0])
    df = summarise(str(tmp_path))
    row = df.iloc[0]
    assert row["nll_fold_wins"] == "1/1"
    assert bool(row["nll_bary_wins"]) is True
    assert row["rmse_fold_wins"] == "2/2"  # 0.5<0.7, 0.6<0.7
