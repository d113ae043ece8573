"""bench.py must ALWAYS leave a parseable JSON artifact (VERDICT r3 item 1).

The round-3 driver capture was empty (rc=1, nothing parsed) because the
backend probe raised SystemExit with prose when the tunnel was down.  The
contract now: on probe failure the bench prints exactly one structured JSON
line (status, probe_s, last_known_good) on stdout and exits 0, so the
driver's ``BENCH_r{N}.json`` always records *something* machine-readable.

These tests drive the real ``bench.py`` in a subprocess with a
near-zero probe budget (``BENCH_PROBE_TIMEOUT_S``) so the probe's
escalation loop and the fail-soft emission run end-to-end without
touching an accelerator.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(env_extra):
    env = dict(os.environ)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
        cwd=REPO,
    )


def test_probe_timeout_emits_structured_json_and_exits_zero():
    proc = _run_bench({"BENCH_PROBE_TIMEOUT_S": "0.01"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["status"] == "backend_unreachable"
    assert rec["metric"].startswith("gmst_full_experiment")
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["probe_s"] is not None and rec["probe_s"] >= 0
    assert rec["last_known_good"]["value"] > 0
    # The escalation loop must have tried all three budgets.
    assert proc.stderr.count("retrying") == 2


def test_probe_subprocess_failure_emits_structured_json(monkeypatch, capsys):
    # The probe subprocess exiting non-zero (backend init error rather than a
    # hang) must also fail soft: status backend_probe_failed, exit code 0.
    # Hermetic: import bench with the probe skipped, then call it with
    # sys.executable pointed at /bin/false so the child exits 1 instantly.
    import importlib.util

    monkeypatch.setenv("BENCH_SKIP_PROBE", "1")
    spec = importlib.util.spec_from_file_location("_bench_failsoft_mod", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.delenv("BENCH_SKIP_PROBE")
    monkeypatch.setattr(sys, "executable", "/bin/false")
    with pytest.raises(SystemExit) as exc:
        mod._probe_backend()
    assert exc.value.code == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["status"] == "backend_probe_failed"
    assert rec["value"] is None
