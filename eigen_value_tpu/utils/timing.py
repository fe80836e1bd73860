"""Timing utilities that measure true device time.

Two complications the reference never had (its `std::chrono` around
`q.wait()` was enough, similarity_transform.cpp:36-58):

1. Async dispatch: a JAX call returns before the device finishes.  Under
   some transports (the axon tunnel) even ``block_until_ready`` returns
   early for simple executables; fetching a scalar derived from the result
   is the only reliable completion barrier.
2. Fixed per-executable latency (RTT) can exceed the kernel time by 100×.
   Per-op cost is therefore measured *marginally*: time a jitted chain of
   k dependent applications and one application, and divide the difference
   by k-1 — the launch latency and the transfer cancel.

``time_marginal`` needs the op to be expressible as a shape-preserving
state transition so the chain stays on device inside one executable.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple

import jax
import numpy as np


def force(out: Any) -> float:
    """Block until ``out`` is actually computed by fetching one scalar.

    Picks the smallest leaf and device-slices a single element so only 4
    bytes cross the wire (the producing executable must still complete
    before the transfer can run).
    """
    leaves = jax.tree_util.tree_leaves(out)
    leaf = min(leaves, key=lambda l: getattr(l, "size", 1))
    if getattr(leaf, "ndim", 0):
        leaf = leaf.ravel()[0]
    return float(np.asarray(leaf))


def time_call(fn: Callable[[], Any], reps: int = 5, warmup: int = 1) -> float:
    """Best-of-reps wall ms of ``fn()`` including a completion barrier."""
    for _ in range(warmup):
        force(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn())
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


def time_marginal(
    step: Callable[[Any, Any], Any],
    init: Any,
    k: int = 64,
    reps: int = 7,
) -> float:
    """Marginal ms per application of ``step(i, state) -> state`` (a
    shape-preserving transition; ``i`` is the chain index), measured as
    (T(k+1 chained) - T(1)) / k inside single jitted executables so launch
    latency cancels.

    ``step`` must not be loop-invariant: carry real data dependence through
    the state (a fused ~1e-38 scalar bias is enough) — otherwise XLA hoists
    the op out of the loop and the marginal reads 0.  k defaults high so
    per-launch latency jitter (±ms on tunneled devices) stays ≪ k·op_ms;
    the two chain lengths are measured interleaved for the same reason.
    """

    def chain(m: int):
        @jax.jit
        def run(state):
            return jax.lax.fori_loop(0, m, step, state)

        return run

    run1, runk = chain(1), chain(k + 1)
    force(run1(init))  # compile both before timing
    force(runk(init))
    t1 = tk = float("inf")
    for _ in range(reps):
        s0 = time.perf_counter()
        force(run1(init))
        t1 = min(t1, (time.perf_counter() - s0) * 1e3)
        s0 = time.perf_counter()
        force(runk(init))
        tk = min(tk, (time.perf_counter() - s0) * 1e3)
    return max(tk - t1, 0.0) / k


def roofline_pct(ms: float, bytes_moved: int, peak_gbps: float) -> float:
    """Achieved HBM bandwidth as % of peak for a memory-bound op."""
    if ms <= 0:
        return float("nan")
    achieved = bytes_moved / (ms * 1e-3) / 1e9
    return 100.0 * achieved / peak_gbps


#: Chip-state boundaries, % of NAMEPLATE HBM bandwidth sustained — the
#: ONE definition shared by the drift suite's per-window rows and the
#: headline record's classification (bench.py), so retuning a boundary
#: can never desynchronize records that are meant to be cross-read.
#: The tunneled v5e drifts between a ~745 GB/s (slow, ~91%) and a
#: ~930+ GB/s (fast, up to ~114% of nameplate — real, not an error)
#: sustained state on a minutes timescale (docs/BENCH_RESULTS.md r2).
FAST_STATE_PCT = 100.0
MID_STATE_PCT = 94.0


def classify_state_pct(pct) -> str | None:
    """'fast' / 'mid' / 'slow' from a nameplate-relative sustained-HBM
    percentage; None for unknown (NaN/None — e.g. CPU test mode)."""
    if pct is None or pct != pct:
        return None
    if pct > FAST_STATE_PCT:
        return "fast"
    return "mid" if pct >= MID_STATE_PCT else "slow"


def detect_peak_hbm_gbps() -> float:
    """Peak HBM bandwidth of the attached device (GB/s), by generation."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except RuntimeError:
        return float("nan")
    table = {
        "v5 lite": 819.0,  # TPU v5e
        "v5litepod": 819.0,
        "v5e": 819.0,
        "v5p": 2765.0,
        "v4": 1228.0,
        "v6": 1640.0,  # v6e (Trillium)
        "v3": 900.0,
        "v2": 700.0,
    }
    for key, bw in table.items():
        if key in kind:
            return bw
    return float("nan")
