"""Profiling/tracing helpers (SURVEY.md §5: the reference had only manual
wall-clock timing; the TPU equivalent is jax.profiler traces viewable in
Perfetto/XProf)."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/eigen_value_tpu_trace") -> Iterator[str]:
    """Capture a device trace around a code region.

    Usage::

        with profiling.trace("/tmp/trace") as d:
            res = max_eigenvalue(A)
            jax.block_until_ready(res)
        # open `d` in XProf / tensorboard-plugin-profile

    Falls back to a no-op (still yielding the dir) if the backend can't
    trace.  Verified working on this repo's remote-TPU tunnel with the
    caveat that only HOST-side activity streams (xplane + trace.json.gz
    are written; device timelines need a locally-attached TPU) — use the
    bench suite's marginal timings for device-side numbers there.
    """
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Optional[dict]:
    """Live HBM usage of device 0, if the backend exposes it."""
    try:
        return jax.devices()[0].memory_stats()
    except Exception:
        return None
