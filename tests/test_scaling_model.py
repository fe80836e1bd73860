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


class TestCalibration:
    """Round-2 calibration machinery (VERDICT r1 item 7)."""

    def test_fit_recovers_synthetic_parameters(self):
        from eigen_value_tpu.utils.scaling_model import (
            ChipSpec,
            fit_exchange,
            gather_exchange_us,
        )

        spec = ChipSpec(ici_gbps=123.0, ici_latency_us=7.5)
        p = 8
        measured = {
            n: gather_exchange_us(n, p, 1, spec)
            for n in (8192, 65536, 524288)
        }
        gbps, lat = fit_exchange(measured, p, spec.itemsize)
        assert gbps == pytest.approx(123.0, rel=1e-6)
        assert lat == pytest.approx(7.5, rel=1e-6)

    def test_fit_latency_dominated_regime(self):
        """Flat-in-n measurements (gloo loopback) give an unresolvable
        bandwidth (inf) and a clean latency estimate."""
        from eigen_value_tpu.utils.scaling_model import fit_exchange

        gbps, lat = fit_exchange({8192: 5600.0, 32768: 5600.0}, 8)
        assert gbps == float("inf")
        assert lat == pytest.approx(5600.0 / 7)

    def test_calibration_rows_rfc_safe(self):
        import json

        from eigen_value_tpu.utils.scaling_model import calibration_rows

        rows = calibration_rows({8192: 5600.0, 32768: 5600.0}, 8)
        for r in rows:
            json.dumps(r, allow_nan=False)  # raises on inf/nan
        fit = [r for r in rows if r["bench"] == "model_calibration_fit"][0]
        assert fit["fit_gbps"] is None

    def test_calibration_rows_explicit_spec_skips_refit(self):
        """Passing a spec must use ITS parameters for both the fit row and
        the predictions (the calibrate suite fits once and reuses that spec
        for the cross-P check; a silent refit could drift from it)."""
        import dataclasses

        from eigen_value_tpu.utils.scaling_model import (
            DEFAULT_SPEC,
            calibration_rows,
            gather_exchange_us,
        )

        spec = dataclasses.replace(DEFAULT_SPEC, ici_gbps=3.0, ici_latency_us=42.0)
        measured = {8192: 5600.0, 32768: 9000.0}
        rows = calibration_rows(measured, 8, spec=spec)
        fit = [r for r in rows if r["bench"] == "model_calibration_fit"][0]
        assert fit["fit_gbps"] == 3.0
        assert fit["fit_latency_us"] == 42.0
        for r in rows:
            if r["bench"] == "model_calibration":
                assert r["predicted_us"] == pytest.approx(
                    gather_exchange_us(r["dim"], 8, 1, spec)
                )

    def test_sensitivity_table_covers_grid(self):
        from eigen_value_tpu.utils.scaling_model import sensitivity_table

        rows = sensitivity_table(chip_counts=(16,))
        assert len(rows) == 4 * 4 * 2  # gbps x latency x solver form
        assert {r["solver"] for r in rows} == {"matvec_gather", "matvec_ring"}
        # efficiency must degrade monotonically with latency at fixed gbps
        g = [
            r
            for r in rows
            if r["solver"] == "matvec_gather" and r["ici_gbps"] == 400.0
        ]
        effs = [r["efficiency"] for r in sorted(g, key=lambda r: r["ici_latency_us"])]
        assert effs == sorted(effs, reverse=True)


class TestModel2D:
    def test_balanced_factorization(self):
        from eigen_value_tpu.utils.scaling_model import balanced_factorization

        assert balanced_factorization(1) == (1, 1)
        assert balanced_factorization(8) == (2, 4)
        assert balanced_factorization(16) == (4, 4)
        assert balanced_factorization(12) == (3, 4)
        assert balanced_factorization(7) == (1, 7)

    def test_degenerate_cols_axis_equals_gather_form(self):
        """pc=1 has no psum: the 2D round time must equal the 1D gathered
        form with p=pr shards (same local GEMV, same rows gather)."""
        from eigen_value_tpu.utils.scaling_model import (
            round_time_2d_us,
            round_time_us,
        )

        for pr in (1, 4, 8):
            assert round_time_2d_us(32768, pr, 1) == pytest.approx(
                round_time_us(32768, pr, ring=False)
            )

    def test_pure_column_sharding_pays_psum_only(self):
        from eigen_value_tpu.utils.scaling_model import (
            exchange_2d_us,
            gather_exchange_us,
        )

        # pr=1: no rows gather (gather_exchange_us(n, 1) == 0), psum > 0
        assert gather_exchange_us(4096, 1) == 0.0
        assert exchange_2d_us(4096, 1, 8) > 0.0

    def test_prediction_table_includes_2d_rows(self):
        from eigen_value_tpu.utils.scaling_model import prediction_table

        rows = prediction_table(dims=[8192], chip_counts=(1, 8))
        solvers = {r["solver"] for r in rows}
        assert "matvec_2d_2x4" in solvers
        r2d = [r for r in rows if r["solver"] == "matvec_2d_2x4"][0]
        # the extra psum makes 2D no faster than the 1D gathered form at
        # the same chip count — it's a memory-capacity play
        r1d = [
            r
            for r in rows
            if r["solver"] == "matvec_gather" and r["chips"] == 8
        ][0]
        assert r2d["round_us"] >= r1d["round_us"]
