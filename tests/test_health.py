"""Health-probe tests (CPU; the wedged-tunnel path is covered by the
deadline branch, which we exercise with an impossible deadline)."""

import json
import subprocess
import sys

from conftest import subprocess_env

from eigen_value_tpu.utils import health


def test_probe_cpu_alive():
    rep = health.probe(deadline_s=120.0, device="cpu")
    assert rep["alive"] is True
    assert rep["platform"] == "cpu"
    assert rep["rtt_ms"] is not None and rep["rtt_ms"] >= 0
    assert rep["probe_s"] <= 120.0


def test_probe_deadline_miss_reports_dead():
    # A deadline shorter than interpreter startup: the probe MUST come
    # back dead (never hang) — the wedged-tunnel contract.
    rep = health.probe(deadline_s=0.2, device="cpu")
    assert rep["alive"] is False
    assert rep["rtt_ms"] is None


def test_check_cpu_with_state():
    rep = health.check(deadline_s=120.0, state_dim=128, device="cpu")
    assert rep["alive"] is True
    assert rep["state"] is not None
    assert rep["state"]["dim"] == 128
    # RFC-valid JSON end to end (allow_nan=False raises on NaN/Infinity)
    json.loads(json.dumps(rep, allow_nan=False))


def test_cli_liveness_only():
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "eigen_value_tpu.utils.health",
            "--device",
            "cpu",
            "--state-dim",
            "0",
        ],
        capture_output=True,
        text=True,
        env=subprocess_env(),
        timeout=180,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["alive"] is True and rep["state"] is None
