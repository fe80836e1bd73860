"""Unit tests for the headline bench's JSON record (bench.py).

The driver consumes bench.py's single JSON stdout line; these tests pin
the record's shape and the window-folding math without touching the TPU
(``summarize`` is pure).
"""

import importlib.util
import json
import math
from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def bench():
    path = Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("headline_bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_summarize_picks_best_window(bench):
    windows = [(6.7, 90.0, 36.0), (6.4, 88.0, 35.0), (6.9, 91.0, 37.0)]
    rec = bench.summarize(windows, rounds=17, backend="matvec_pallas")
    assert rec["value"] == 6.4
    assert rec["vs_baseline"] == round(bench.BASELINE_MS / 6.4, 2)
    # Walls come from the SAME (best) window, not mixed across windows.
    assert rec["wall_chain_ms"] == 88.0
    assert rec["wall_single_ms"] == 35.0


def test_summarize_spread_fields(bench):
    windows = [(6.7, 90.0, 36.0), (6.4, 88.0, 35.0), (6.9, 91.0, 37.0)]
    rec = bench.summarize(windows, rounds=17, backend="matvec_pallas")
    assert rec["windows_ms"] == [6.4, 6.7, 6.9]
    assert rec["median_ms"] == 6.7
    assert rec["rounds"] == 17
    assert rec["backend"] == "matvec_pallas"


def test_summarize_even_window_median_is_averaged(bench):
    windows = [(6.0, 80.0, 30.0), (6.0, 80.0, 30.0), (6.6, 88.0, 36.0), (6.6, 88.0, 36.0)]
    rec = bench.summarize(windows, rounds=17, backend="matvec_pallas")
    assert rec["median_ms"] == 6.3


def test_summarize_single_window(bench):
    rec = bench.summarize([(6.55, 89.0, 36.0)], rounds=17, backend="xla")
    assert rec["value"] == 6.55
    assert rec["windows_ms"] == [6.55]
    assert rec["median_ms"] == 6.55


def test_summarize_json_contract(bench):
    """The record must round-trip as one RFC-valid JSON line."""
    rec = bench.summarize([(6.55, 89.0, 36.0)], rounds=17, backend="xla")
    line = json.dumps(rec, allow_nan=False)  # NaN/Infinity must raise here
    assert "\n" not in line
    back = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline", "rounds"):
        assert key in back
    assert back["unit"] == "ms"
    assert all(math.isfinite(v) for v in back["windows_ms"])
