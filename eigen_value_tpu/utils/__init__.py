"""Utilities: timing, AOT compilation cache, profiling, scaling model,
device health diagnostics."""

from . import health, profiling, scaling_model
from .aot import disable_persistent_cache, enable_persistent_cache
from .timing import detect_peak_hbm_gbps, force, roofline_pct, time_call, time_marginal

__all__ = [
    "detect_peak_hbm_gbps",
    "disable_persistent_cache",
    "enable_persistent_cache",
    "force",
    "roofline_pct",
    "time_call",
    "time_marginal",
]
