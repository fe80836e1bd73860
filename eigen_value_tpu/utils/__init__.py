"""Utilities: timing, table formatting."""

from .timing import detect_peak_hbm_gbps, force, roofline_pct, time_call, time_marginal

__all__ = [
    "detect_peak_hbm_gbps",
    "force",
    "roofline_pct",
    "time_call",
    "time_marginal",
]
