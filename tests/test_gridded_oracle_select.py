"""The gridded bench's parity gate must pick the oracle entry matching the
run configuration — including from the multi-entry warm oracle file (one
entry per --fine-nits setting) and legacy single-entry files."""

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"),
)

from gridded_bench import select_oracle_entry


def _entry(fine, cells=64, nits=500, stride=5, lat=180, lon=360):
    return {
        "n_optim_nits": nits,
        "n_cells": cells,
        "warm_stride": stride,
        "fine_nits": fine,
        "lat": lat,
        "lon": lon,
        "bary_mean": [0.0] * cells,
        "bary_std": [1.0] * cells,
    }


def test_multi_entry_picks_matching_fine_count():
    loaded = {"entries": [_entry(100), _entry(50)]}
    for fine in (100, 50):
        got = select_oracle_entry(
            loaded, n_iters=500, n_cells=5400, warm_stride=5,
            fine_nits=fine, lat=180, lon=360,
        )
        assert got is not None and got["fine_nits"] == fine
    assert select_oracle_entry(
        loaded, n_iters=500, n_cells=5400, warm_stride=5,
        fine_nits=70, lat=180, lon=360,
    ) is None


def test_legacy_single_entry_and_nonwarm():
    legacy = _entry(100)
    got = select_oracle_entry(
        legacy, n_iters=500, n_cells=5400, warm_stride=5,
        fine_nits=100, lat=180, lon=360,
    )
    assert got is legacy
    nonwarm = {"n_optim_nits": 500, "n_cells": 64, "bary_mean": [], "bary_std": []}
    got = select_oracle_entry(
        nonwarm, n_iters=500, n_cells=2592, warm_stride=0,
        fine_nits=100, lat=36, lon=72,
    )
    assert got is nonwarm
    # Mismatched geometry / step count / subset size must not match.
    assert select_oracle_entry(
        legacy, n_iters=500, n_cells=5400, warm_stride=5,
        fine_nits=100, lat=90, lon=180,
    ) is None
    assert select_oracle_entry(
        nonwarm, n_iters=200, n_cells=2592, warm_stride=0,
        fine_nits=0, lat=36, lon=72,
    ) is None
    assert select_oracle_entry(
        nonwarm, n_iters=500, n_cells=32, warm_stride=0,
        fine_nits=0, lat=36, lon=72,
    ) is None


def test_committed_warm_oracle_has_default_and_fast_entries():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        "gridded_oracle_warm.json",
    )
    with open(path) as f:
        loaded = json.load(f)
    fines = sorted(
        e["fine_nits"] for e in loaded["entries"]
        if e["n_optim_nits"] == 500 and (e["lat"], e["lon"]) == (180, 360)
    )
    # Default fine pass (n/5 = 100) and the measured fast setting (50) from
    # the BASELINE.md fine-step sweep must both gate.
    assert 100 in fines and 50 in fines


def test_committed_oracle_has_fast_profile_bfgs_entry():
    # The fast profile (bfgs-30) hard-fails when its identity gate cannot
    # run, so the committed oracle must carry the matching entry.
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        "gridded_oracle.json",
    )
    with open(path) as f:
        loaded = json.load(f)
    got = select_oracle_entry(
        loaded, n_iters=30, n_cells=2592, warm_stride=0,
        fine_nits=0, lat=36, lon=72, optimizer="bfgs",
    )
    assert got is not None and got["optimizer"] == "bfgs"


def test_fast_profile_refuses_ungated_run(capsys):
    import pytest

    from gridded_bench import check_identity_gate_ran

    with pytest.raises(SystemExit) as ei:
        check_identity_gate_ran(
            "fast", "benchmarks/gridded_oracle.json", opt="bfgs",
            n_iters=30, warm_stride=0, fine_nits=0, lat=36, lon=72,
        )
    msg = str(ei.value)
    assert "identity gate" in msg and "gridded_oracle.py 30 64" in msg
    assert "--optimizer bfgs" in msg
    # The faithful profile only notes the skip (smoke runs at unanchored
    # configs stay runnable) — with the same regeneration hint.
    check_identity_gate_ran(
        "faithful", "benchmarks/gridded_oracle.json", opt="adam",
        n_iters=123, warm_stride=0, fine_nits=0, lat=36, lon=72,
    )
    err = capsys.readouterr().err
    assert "SKIPPED" in err and "gridded_oracle.py 123 64" in err


def test_fast_profile_rejects_explicit_gate():
    # The profile owns the gate: the quality gate is subset-sensitive for
    # bfgs (+-10%, BASELINE.md) and would spuriously fail a healthy run —
    # and allowing it would bypass the fail-closed identity-gate promise.
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            _sys.executable,
            os.path.join(repo, "benchmarks", "gridded_bench.py"),
            "500", "36", "72", "--profile", "fast", "--gate", "quality",
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 2
    assert "identity oracle" in proc.stderr


def test_oracle_writer_replaces_matching_entry(tmp_path):
    # Mirror gridded_oracle.py's merge semantics: same config key replaces,
    # different key appends.
    path = tmp_path / "warm.json"
    key = ("n_optim_nits", "n_cells", "warm_stride", "fine_nits", "lat", "lon")

    def write(out):
        entries = []
        if path.exists():
            prev = json.loads(path.read_text())
            entries = prev["entries"] if "entries" in prev else [prev]
        entries = [
            e for e in entries
            if tuple(e.get(k) for k in key) != tuple(out[k] for k in key)
        ]
        entries.append(out)
        path.write_text(json.dumps({"entries": entries}))

    write(_entry(100))
    write(_entry(50))
    e100 = _entry(100)
    e100["bary_mean"] = [9.0] * 64
    write(e100)
    loaded = json.loads(path.read_text())
    assert len(loaded["entries"]) == 2
    got = select_oracle_entry(
        loaded, n_iters=500, n_cells=5400, warm_stride=5,
        fine_nits=100, lat=180, lon=360,
    )
    assert got["bary_mean"][0] == 9.0


def test_replace_oracle_entry_replaces_legacy_keyless_entry():
    """Regenerating a configuration recorded by a LEGACY entry (written
    before warm_stride/optimizer/... keys existed) must replace it, not
    append a duplicate the bench would then silently prefer."""
    from gridded_common import replace_oracle_entry

    legacy = {"n_optim_nits": 500, "n_cells": 64,
              "bary_mean": [0.0], "bary_std": [1.0]}
    fresh = {"n_optim_nits": 500, "n_cells": 64, "warm_stride": 0,
             "fine_nits": None, "lat": None, "lon": None,
             "optimizer": "adam", "bary_mean": [0.5], "bary_std": [1.5]}
    got = replace_oracle_entry([legacy], fresh)
    assert got == [fresh]
    # a DIFFERENT configuration coexists
    other = dict(fresh, optimizer="bfgs", n_optim_nits=30)
    assert replace_oracle_entry(got, other) == [fresh, other]
