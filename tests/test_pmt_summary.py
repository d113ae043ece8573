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
