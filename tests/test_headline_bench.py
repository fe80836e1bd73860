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


def test_should_extend_stops_on_fast_window(bench):
    # A window at/below the fast-state target ends the extension: the min
    # already hit the target, more sampling is wasted driver time.
    windows = [(6.5, 90.0, 36.0), (6.05, 88.0, 35.0)]
    assert bench.should_extend(windows, elapsed_s=100.0) is False


def test_should_extend_continues_while_slow_and_in_budget(bench):
    windows = [(6.5, 90.0, 36.0), (6.6, 88.0, 35.0)]
    assert bench.should_extend(windows, elapsed_s=100.0) is True


def test_should_extend_respects_budget(bench):
    windows = [(6.5, 90.0, 36.0)]
    # elapsed + gap + measurement headroom would overrun the budget
    assert (
        bench.should_extend(windows, elapsed_s=880.0, budget_s=900.0) is False
    )
    assert (
        bench.should_extend(windows, elapsed_s=10.0, budget_s=900.0) is True
    )


def test_should_extend_empty_windows(bench):
    assert bench.should_extend([], elapsed_s=0.0) is False


def test_should_extend_bar_cleared_early_exit(bench):
    """VERDICT r4 weak item 1: when the best clean window already beats
    the 126 ms baseline by ≥ BAR_CLEARED_X (default 30×), the extension
    stops even though the fast-state target was never reached — the hunt
    can't change the verdict and only risks the driver's outer timeout.
    This is exactly the round-4 record's shape: sym windows ~3.46 ms
    (36×) hunting a 3.24 ms target for 10 extra windows."""
    windows = [(3.46, 54.0, 27.0), (3.53, 55.0, 27.0)]
    # 126/3.46 = 36.4x ≥ 30 ⇒ stop, despite target 3.24 not reached
    assert (
        bench.should_extend(windows, elapsed_s=100.0, target_ms=3.24)
        is False
    )
    # margin not reached (e.g. the dense backend at 6.5 ms = 19.4x) ⇒
    # the fast-state hunt still runs
    assert (
        bench.should_extend(
            [(6.5, 90.0, 36.0)], elapsed_s=100.0, target_ms=6.1
        )
        is True
    )
    # explicit margin: 40x would keep hunting at 3.46 ms
    assert (
        bench.should_extend(
            windows, elapsed_s=100.0, target_ms=3.24, bar_cleared_x=40.0
        )
        is True
    )
    # 0 disables the exit (the round-4 always-hunt behavior)
    assert (
        bench.should_extend(
            windows, elapsed_s=100.0, target_ms=3.24, bar_cleared_x=0.0
        )
        is True
    )
    # a suspect sub-floor window can't claim the bar
    assert (
        bench.should_extend(
            [(2.0, 54.0, 27.0)],
            elapsed_s=100.0,
            target_ms=3.24,
            floor_ms=3.0,
        )
        is True
    )


def test_should_extend_custom_target(bench):
    windows = [(6.5, 90.0, 36.0)]
    assert (
        bench.should_extend(windows, elapsed_s=0.0, target_ms=6.5) is False
    )
    assert (
        bench.should_extend(windows, elapsed_s=0.0, target_ms=6.4) is True
    )


def test_physical_floor(bench):
    # 18 passes × 8192² × 4 B at 819·1.2 GB/s ≈ 4.9 ms (8192 is the
    # module default DIM in the test env unless BENCH_DIM overrides)
    f = bench.physical_floor_ms(17, 819.0, dim=8192)
    assert 4.5 < f < 5.3
    # NaN / unknown peak disables the guard
    assert bench.physical_floor_ms(17, float("nan"), dim=8192) == 0.0
    assert bench.physical_floor_ms(17, None, dim=8192) == 0.0


def test_summarize_excludes_suspect_windows(bench):
    # A transport artifact (5.0 ms < 5.2 ms floor) must not become the
    # record: min/median/walls come from the clean pool only.
    windows = [(6.7, 90.0, 36.0), (5.0, 70.0, 40.0), (6.4, 88.0, 35.0)]
    rec = bench.summarize(windows, rounds=17, backend="matvec_pallas", floor_ms=5.2)
    assert rec["value"] == 6.4
    assert rec["windows_ms"] == [6.4, 6.7]
    assert rec["suspect_windows_ms"] == [5.0]
    assert rec["floor_ms"] == 5.2
    assert "suspect" not in rec


def test_summarize_all_suspect_flags_record(bench):
    rec = bench.summarize(
        [(4.0, 70.0, 40.0), (4.5, 72.0, 41.0)],
        rounds=17,
        backend="matvec_pallas",
        floor_ms=5.2,
    )
    assert rec["suspect"] is True
    assert rec["value"] == 4.0  # still reported, but flagged


def test_should_extend_ignores_suspect_fast_window(bench):
    # A sub-floor "fast" artifact must not stop the hunt for a REAL fast
    # window.
    windows = [(6.5, 90.0, 36.0), (5.0, 70.0, 40.0)]
    assert (
        bench.should_extend(windows, elapsed_s=100.0, floor_ms=5.2) is True
    )
    # ...but a real fast window still stops it.
    windows.append((6.05, 88.0, 35.0))
    assert (
        bench.should_extend(windows, elapsed_s=100.0, floor_ms=5.2) is False
    )


def test_extension_budget_caps_by_deadline(bench):
    # Plenty of wall left: the configured extension cap applies.
    assert bench.extension_budget(900.0, 1200.0, 75.0, 100.0) == 900.0
    # Startup ate the wall (the round-3 failure): cap shrinks so the
    # worker still emits before the supervisor's SIGTERM.
    assert bench.extension_budget(900.0, 1200.0, 75.0, 400.0) == 725.0
    # Degenerate: startup alone overran — no extension at all.
    assert bench.extension_budget(900.0, 1200.0, 75.0, 1150.0) == 0.0


def test_classify_chip_state(bench):
    # 18 passes × 8192² × 4 B = 4.832 GB; nameplate 819 GB/s.
    # 6.39 ms → 756 GB/s = 92% → slow; 6.0 ms → 805 GB/s = 98% → mid;
    # 5.5 ms → 879 GB/s = 107% → fast.
    assert bench.classify_chip_state(6.39, 17, 819.0, dim=8192) == "slow"
    assert bench.classify_chip_state(6.0, 17, 819.0, dim=8192) == "mid"
    assert bench.classify_chip_state(5.5, 17, 819.0, dim=8192) == "fast"
    # Unknown peak (CPU test mode) disables classification.
    assert bench.classify_chip_state(6.0, 17, float("nan"), dim=8192) is None
    assert bench.classify_chip_state(6.0, 17, None, dim=8192) is None


def test_summarize_chip_state_fields(bench, monkeypatch):
    monkeypatch.setattr(bench, "DIM", 8192)
    windows = [(6.39, 90.0, 36.0), (6.0, 88.0, 35.0), (6.5, 91.0, 37.0)]
    rec = bench.summarize(
        windows, rounds=17, backend="multiround_pallas", peak_gbps=819.0
    )
    assert rec["chip_state"] == "mid"  # state of the best window
    assert rec["chip_states"] == {"slow": 2, "mid": 1}
    assert "chip_state_note" not in rec  # a mid window was seen


def test_summarize_all_slow_note(bench, monkeypatch):
    monkeypatch.setattr(bench, "DIM", 8192)
    windows = [(6.45, 90.0, 36.0), (6.5, 91.0, 37.0)]
    rec = bench.summarize(
        windows, rounds=17, backend="multiround_pallas", peak_gbps=819.0
    )
    assert rec["chip_states"] == {"slow": 2}
    assert "slow HBM state" in rec["chip_state_note"]
    # the note names the slow-state physical floor (~6.27 ms here)
    assert "6.2" in rec["chip_state_note"] or "6.3" in rec["chip_state_note"]


def test_summarize_without_peak_has_no_chip_state(bench):
    rec = bench.summarize([(6.4, 88.0, 35.0)], rounds=17, backend="xla")
    assert "chip_state" not in rec
    assert "chip_states" not in rec


def test_call_with_deadline(bench):
    assert bench._call_with_deadline(lambda: 41 + 1, 5.0) == 42
    with pytest.raises(TimeoutError):
        bench._call_with_deadline(lambda: __import__("time").sleep(3), 0.2)
    with pytest.raises(RuntimeError, match="boom"):
        bench._call_with_deadline(
            lambda: (_ for _ in ()).throw(RuntimeError("boom")), 5.0
        )


def test_failure_record_shape(bench):
    rec = bench.failure_record(worker_rc=-9)
    line = json.dumps(rec, allow_nan=False)
    back = json.loads(line)
    assert back["value"] is None
    assert back["vs_baseline"] is None
    assert back["unit"] == "ms"
    assert "error" in back and "rc=-9" in back["error"]


def test_wait_for_tunnel_recovers(bench):
    """The recovery wait returns True as soon as a probe reports alive,
    after sleeping the configured gap before each probe."""
    clock = {"t": 0.0}
    sleeps = []

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    probes = iter([False, False, True])
    got = bench.wait_for_tunnel(
        budget_s=600.0,
        gap_s=30.0,
        probe=lambda: next(probes),
        _sleep=fake_sleep,
        _mono=lambda: clock["t"],
    )
    assert got is True
    assert sleeps == [30.0, 30.0, 30.0]


def test_wait_for_tunnel_budget_exhausted(bench):
    """A tunnel that never recovers exhausts the budget and returns
    False; the loop leaves headroom for one probe after the final sleep."""
    clock = {"t": 0.0}

    def fake_sleep(s):
        clock["t"] += s

    calls = {"n": 0}

    def probe():
        calls["n"] += 1
        clock["t"] += 60.0  # each failed probe burns its full deadline
        return False

    got = bench.wait_for_tunnel(
        budget_s=300.0,
        gap_s=60.0,
        probe=probe,
        _sleep=fake_sleep,
        _mono=lambda: clock["t"],
    )
    assert got is False
    assert calls["n"] == 2  # (60 sleep + 60 probe) per cycle within 300 - 120 headroom


def test_wait_for_tunnel_zero_budget(bench):
    got = bench.wait_for_tunnel(
        budget_s=0.0,
        gap_s=60.0,
        probe=lambda: True,
        _sleep=lambda s: None,
        _mono=lambda: 0.0,
    )
    assert got is False


def test_bench_py_emits_diagnostic_when_no_window_completes():
    """A deadline so short the worker dies before any window must still
    produce one parseable JSON line explaining the failure (the driver
    records bench stdout verbatim — an empty artifact is uninterpretable)."""
    import subprocess
    import sys

    from conftest import subprocess_env

    out = subprocess.run(
        [sys.executable, str(Path(__file__).resolve().parent.parent / "bench.py")],
        capture_output=True,
        text=True,
        env=subprocess_env(
            BENCH_DEVICE="cpu",
            BENCH_DIM="128",
            BENCH_DEADLINE_S="0.2",  # worker is killed mid-startup
        ),
        timeout=120,
    )
    assert out.returncode != 0  # a failure record is still a failure
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["value"] is None
    assert "error" in rec


@pytest.mark.slow
def test_bench_py_end_to_end_cpu_with_extension():
    """Run bench.py itself off-TPU (BENCH_DEVICE=cpu, 128²) with the
    extension forced on (impossible fast target, ~25 s budget — wide
    enough that the bf16 secondary, which now runs before the extension
    and shares its clock, cannot starve it): the JSON record must be
    valid, round parity must hold (9 @ 128²), and the window list must
    show beyond-base sampling."""
    import subprocess
    import sys

    from conftest import subprocess_env

    out = subprocess.run(
        [sys.executable, str(Path(__file__).resolve().parent.parent / "bench.py")],
        capture_output=True,
        text=True,
        env=subprocess_env(
            BENCH_DEVICE="cpu",
            BENCH_DIM="128",
            BENCH_WINDOWS="2",
            BENCH_WINDOW_GAP_S="0.1",
            BENCH_FAST_TARGET_MS="0",  # unreachable: always "slow"
            BENCH_BAR_CLEARED_X="0",  # disable the bar-cleared early exit
            BENCH_EXTEND_S="25",  # a few seconds of extra windows, then stop
            BENCH_DEADLINE_S="240",
        ),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "parity broken" not in out.stderr
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["rounds"] == 9
    assert rec["unit"] == "ms"
    assert len(rec["windows_ms"]) > 2  # extension sampled past the base
    assert rec["value"] == rec["windows_ms"][0]
    # The bf16 secondary must be in the record even though the run
    # extended — it is measured BEFORE the extension (the round-3 driver
    # record lost it to a mid-extension SIGTERM; now it can't).
    assert "bf16_ms" in rec and rec["bf16_ms"] > 0
    # stderr ordering proves the sequencing: bf16 line precedes the
    # first beyond-base window line.
    assert out.stderr.index("bf16 secondary") < out.stderr.index("window 2")
    # Same for the matrix-free FFT secondary: present, measured before
    # the extension, exact parity with the headline solve (the Hilbert
    # matrix IS Hankel — same rounds, same lambda, no drift note).
    assert "hankel_fft_ms" in rec and rec["hankel_fft_ms"] > 0
    assert rec["hankel_fft_rounds"] == rec["rounds"]
    assert "PARITY DRIFT" not in rec["hankel_fft_note"]
    assert out.stderr.index("hankel fft secondary") < out.stderr.index(
        "window 2"
    )


@pytest.mark.slow
def test_bf16_timeout_skips_extension():
    """A bf16 watchdog timeout must (a) still emit the base-window
    record with a self-explaining note and (b) skip the extension —
    the abandoned thread's RPCs would pollute every extension window
    and mislabel self-inflicted contention as chip state (review
    finding, round 4)."""
    import subprocess
    import sys

    from conftest import subprocess_env

    out = subprocess.run(
        [sys.executable, str(Path(__file__).resolve().parent.parent / "bench.py")],
        capture_output=True,
        text=True,
        env=subprocess_env(
            BENCH_DEVICE="cpu",
            BENCH_DIM="128",
            BENCH_WINDOWS="2",
            BENCH_WINDOW_GAP_S="0.1",
            BENCH_FAST_TARGET_MS="0",  # would force extension...
            BENCH_EXTEND_S="600",
            BENCH_DEADLINE_S="240",
            BENCH_BF16_DEADLINE_S="0.001",  # ...but bf16 times out first
        ),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(rec["windows_ms"]) == 2  # base only — no extension
    assert "bf16_ms" not in rec
    assert "timed out" in rec["bf16_note"]


@pytest.mark.slow
def test_sigterm_mid_extension_record_keeps_bf16():
    """VERDICT r3 item 1's done-criterion, simulated end-to-end: a worker
    SIGTERM'd DURING the extension (the exact way round 3 lost its bf16
    secondary) must still emit a record containing bf16_ms.  We run the
    WORKER directly (BENCH_SUPERVISED=1, so no in-process supervisor
    forwards/absorbs the signal), wait for the bf16 stderr marker that
    proves base windows + secondary completed, then SIGTERM it."""
    import signal as _signal
    import subprocess
    import sys
    import time

    from conftest import subprocess_env

    proc = subprocess.Popen(
        [sys.executable, str(Path(__file__).resolve().parent.parent / "bench.py")],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=subprocess_env(
            BENCH_SUPERVISED="1",
            BENCH_DEVICE="cpu",
            BENCH_DIM="128",
            BENCH_WINDOWS="2",
            BENCH_WINDOW_GAP_S="8",  # wide gaps: plenty of room to TERM
            BENCH_FAST_TARGET_MS="0",  # unreachable: extension guaranteed
            BENCH_EXTEND_S="600",
            BENCH_DEADLINE_S="600",
        ),
    )
    # poll stderr until the bf16 marker, then TERM mid-extension (the
    # 8 s inter-window sleep makes the timing deterministic enough)
    import threading

    lines = []
    got_bf16 = threading.Event()

    def drain():
        for line in proc.stderr:
            lines.append(line)
            if "bf16 secondary" in line:
                got_bf16.set()

    th = threading.Thread(target=drain, daemon=True)
    th.start()
    assert got_bf16.wait(timeout=240), f"no bf16 marker; stderr: {lines[-5:]}"
    time.sleep(2.0)  # let the extension loop enter its window gap
    proc.send_signal(_signal.SIGTERM)
    out, _ = proc.communicate(timeout=60)
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["bf16_ms"] > 0  # the round-3 loss mode, closed
    assert len(rec["windows_ms"]) >= 2


def test_supervise_retries_once_after_recovery(bench, monkeypatch, capsys):
    """First worker attempt yields no output, the probe reports recovery,
    the retry's output is forwarded verbatim."""
    calls = []

    def fake_worker(deadline):
        calls.append(deadline)
        return ("", 1) if len(calls) == 1 else ('{"value": 5}\n', 0)

    monkeypatch.setattr(bench, "_run_worker", fake_worker)
    monkeypatch.setattr(bench, "wait_for_tunnel", lambda b, g: True)
    monkeypatch.setattr(bench, "RETRY_BUDGET_S", 10.0)
    monkeypatch.delenv("BENCH_DEVICE", raising=False)
    assert bench.supervise() == 0
    assert len(calls) == 2
    assert '"value": 5' in capsys.readouterr().out


def test_supervise_failure_record_counts_attempts(bench, monkeypatch, capsys):
    """Both attempts fail: the record reports attempts=2 and the LAST
    worker's rc, not the misleading single-deadline claim."""
    monkeypatch.setattr(bench, "_run_worker", lambda d: ("", -9))
    monkeypatch.setattr(bench, "wait_for_tunnel", lambda b, g: True)
    monkeypatch.setattr(bench, "RETRY_BUDGET_S", 10.0)
    monkeypatch.delenv("BENCH_DEVICE", raising=False)
    assert bench.supervise() != 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["attempts"] == 2
    assert "rc=-9" in rec["error"] and "2 worker" in rec["error"]


def test_supervise_cpu_mode_never_retries(bench, monkeypatch, capsys):
    """CPU test mode must not enter the recovery wait (there is no tunnel
    to recover)."""
    calls = []
    monkeypatch.setattr(
        bench, "_run_worker", lambda d: (calls.append(d), ("", 1))[1]
    )
    monkeypatch.setattr(
        bench, "wait_for_tunnel",
        lambda b, g: (_ for _ in ()).throw(AssertionError("must not probe")),
    )
    monkeypatch.setenv("BENCH_DEVICE", "cpu")
    assert bench.supervise() != 0
    assert len(calls) == 1
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["attempts"] == 1

def test_physical_floor_scales_with_traffic_frac(bench):
    """The symmetric backend moves frac≈0.531 of the dense bytes; its
    floor must scale with it or every symmetric reading reads 'suspect'."""
    dense = bench.physical_floor_ms(17, 819.0, dim=8192)
    sym = bench.physical_floor_ms(17, 819.0, dim=8192, frac=0.53125)
    assert sym == pytest.approx(dense * 0.53125)
    assert 2.4 < sym < 2.8


def test_classify_chip_state_honors_frac(bench):
    """A 3.5 ms symmetric 18-pass window at 8192² is ~729 GB/s sustained
    (slow state); classified with dense traffic it would read an
    impossible 1373 GB/s (>nameplate ⇒ 'fast') — the exact inversion the
    frac plumbing exists to prevent."""
    assert (
        bench.classify_chip_state(3.5, 17, 819.0, dim=8192, frac=0.53125)
        == "slow"
    )
    assert bench.classify_chip_state(3.5, 17, 819.0, dim=8192) == "fast"
    # a genuinely fast symmetric window (~2.75 ms ⇒ ~933 GB/s)
    assert (
        bench.classify_chip_state(2.75, 17, 819.0, dim=8192, frac=0.53125)
        == "fast"
    )


def test_summarize_symmetric_record_self_describes(bench):
    """A symmetric-backend record carries traffic_frac, frac-scaled
    chip-state classification, and a frac-scaled slow-floor note with
    the effective extension target."""
    frac = 0.53125
    windows = [(3.52, 60.0, 30.0), (3.55, 61.0, 30.5)]
    rec = bench.summarize(
        windows, rounds=17, backend="multiround_sym_pallas",
        floor_ms=2.6, peak_gbps=819.0, frac=frac, fast_target_ms=3.24,
    )
    assert rec["traffic_frac"] == round(frac, 4)
    assert rec["chip_state"] == "slow"
    assert rec["chip_states"] == {"slow": 2}
    assert "3.24" in rec["chip_state_note"]
    # the frac-scaled slow floor (~3.33 ms at 94% of nameplate)
    assert "~3.3" in rec["chip_state_note"]


def test_summarize_dense_record_has_no_traffic_frac(bench):
    rec = bench.summarize(
        [(6.4, 88.0, 35.0)], rounds=17, backend="multiround_pallas"
    )
    assert "traffic_frac" not in rec


def test_no_fast_target_disables_condition_a(bench):
    """NO_FAST_TARGET (the compute-bound cached backend) must never fire
    the fast-window exit — a traffic-scaled target sits below the VPU
    compute floor (review r5c) — while the bar-cleared exit and the
    budget still end the extension."""
    fast = [(1.3, 14.0, 2.3)]  # would beat any float target
    # fast-window exit disabled...
    assert bench.should_extend(
        fast, elapsed_s=10.0, target_ms=bench.NO_FAST_TARGET,
        bar_cleared_x=0.0,
    ) is True
    # ...but bar-cleared still fires (126/1.3 ≈ 97×)
    assert bench.should_extend(
        fast, elapsed_s=10.0, target_ms=bench.NO_FAST_TARGET,
        bar_cleared_x=30.0,
    ) is False
    # ...and the budget still caps it
    assert bench.should_extend(
        fast, elapsed_s=880.0, target_ms=bench.NO_FAST_TARGET,
        budget_s=900.0, bar_cleared_x=0.0,
    ) is False


def test_all_suspect_windows_not_classified(bench):
    """A record whose every window is sub-floor (transport artifact)
    must carry suspect=true and NO chip-state fields — classifying the
    artifact readings would label them the 'fast' state (review r5c)."""
    windows = [(0.9, 12.0, 3.0), (1.0, 13.0, 3.1)]
    rec = bench.summarize(
        windows, rounds=17, backend="multiround_pallas", floor_ms=5.5,
        peak_gbps=819.0,
    )
    assert rec["suspect"] is True
    assert "chip_state" not in rec
    assert "chip_states" not in rec
    # clean windows still classify
    rec2 = bench.summarize(
        [(6.0, 80.0, 30.0)], rounds=17, backend="multiround_pallas",
        floor_ms=5.5, peak_gbps=819.0,
    )
    assert rec2.get("chip_state") == "mid"
