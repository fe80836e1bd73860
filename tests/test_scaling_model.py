"""Analytical scaling model: calibration and limiting behavior."""

import pytest

from eigen_value_tpu.utils import scaling_model as sm


def test_single_chip_calibration():
    """P=1 must reproduce the measured per-round time (0.326 ms at 8192²,
    docs/BENCH_RESULTS.md) within the model's ~5% calibration slack."""
    assert sm.round_time_us(8192, 1) == pytest.approx(326, rel=0.05)
    assert sm.scaling_efficiency(8192, 1) == 1.0


def test_ring_never_worse_than_gather():
    for n in (8192, 32768, 65536):
        for p in (4, 8, 16, 64):
            hosts = max(1, p // 8)
            assert sm.round_time_us(n, p, hosts, ring=True) <= sm.round_time_us(
                n, p, hosts, ring=False
            ) + 1e-9


def test_efficiency_decreases_with_chips_at_fixed_n():
    effs = [sm.scaling_efficiency(8192, p, max(1, p // 8)) for p in (1, 8, 64, 256)]
    assert all(a >= b - 1e-9 for a, b in zip(effs, effs[1:]))


def test_bigger_problems_scale_better():
    """Weak-scaling intuition: at fixed P, larger n has more compute to
    hide the O(n) exchange behind ⇒ higher efficiency."""
    assert sm.scaling_efficiency(65536, 64, 8) > sm.scaling_efficiency(8192, 64, 8)


def test_north_star_prediction_80pct_at_two_hosts():
    """BASELINE config 5 regime (32768², ≥2 hosts): the model predicts the
    ≥80% weak-scaling target is met for both exchange forms."""
    assert sm.scaling_efficiency(32768, 16, hosts=2, ring=False) > 0.8
    assert sm.scaling_efficiency(32768, 16, hosts=2, ring=True) > 0.8


def test_overlap_fully_hides_ici_for_large_chunks():
    """Ring exchange is free when each chunk's GEMV exceeds its wire time
    (the overlap premise) — true for 32768² on a single-host mesh."""
    assert sm.ring_exchange_exposed_us(32768, 8, hosts=1) == 0.0
