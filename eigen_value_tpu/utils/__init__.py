"""Utilities: timing, AOT compilation cache, profiling, scaling model,
device health diagnostics."""

from . import profiling, scaling_model
from .aot import (
    disable_persistent_cache,
    enable_persistent_cache,
    export_sharded_solver,
    export_solver,
    load_exported,
    save_exported,
)
from .timing import detect_peak_hbm_gbps, force, roofline_pct, time_call, time_marginal


def __getattr__(name):
    # Lazy so `python -m eigen_value_tpu.utils.health` doesn't import the
    # module twice (package-eager + runpy) and trip RuntimeWarning.
    if name == "health":
        import importlib

        return importlib.import_module(".health", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "detect_peak_hbm_gbps",
    "disable_persistent_cache",
    "enable_persistent_cache",
    "export_sharded_solver",
    "export_solver",
    "force",
    "load_exported",
    "roofline_pct",
    "save_exported",
    "time_call",
    "time_marginal",
]
