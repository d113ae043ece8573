"""The quickstart example must run end-to-end (tiny shapes, CPU)."""

import os
import runpy
import sys


def test_quickstart_runs(capsys):
    path = os.path.join(os.path.dirname(__file__), "..", "examples", "quickstart.py")
    sys.argv = ["quickstart"]
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "ensemble mean at final year" in out
    assert "NLL vs obs" in out


def test_monthly_warm_runs(capsys):
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "monthly_warm.py"
    )
    sys.argv = ["monthly_warm"]
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "monthly ensemble mean at final month" in out
    assert "NLL vs obs" in out


def test_gridded_quickstart_runs(capsys):
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "gridded_quickstart.py"
    )
    sys.argv = ["gridded_quickstart"]
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "mean weight per model" in out


def test_gridded_refined_runs(capsys):
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "gridded_refined.py"
    )
    sys.argv = ["gridded_refined"]
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "refined moments dtype: float64" in out
    assert "drift removed" in out
