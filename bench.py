"""Headline benchmark: 8192² Hilbert end-to-end solve on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: 126 ms / 17 rounds — the reference's best machine (Xeon Platinum
8358, reference README.md:92; see BASELINE.md).  vs_baseline is the
speedup factor (baseline_ms / our_ms), so >1 beats the reference.

``value`` is the on-device e2e solve time: wall time of the solve call
minus the calibrated per-executable launch+fetch latency of the transport
(~31 ms through the remote-TPU tunnel — pure infrastructure, present even
for an empty executable).  This matches what the reference times: its
clock starts after queue/buffer setup (similarity_transform.cpp:36).
Raw wall and the calibration are included in the JSON for transparency.
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS = 126.0  # reference best-CPU 8192² e2e (BASELINE.md)
DIM = 8192
ROUNDS_EXPECTED = 17
REPEATS = 15


def _sync_scalar(x) -> float:
    return float(np.asarray(x))


def _median_ms(fn, reps=REPEATS) -> float:
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def main() -> None:
    from eigen_value_tpu import SolverConfig, fixtures
    from eigen_value_tpu.api import _solve_fn, resolve_backend

    cfg = SolverConfig(backend="auto")
    backend = resolve_backend(cfg, DIM)
    solve = jax.jit(_solve_fn(cfg, backend, DIM))
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))

    res = solve(H)
    rounds = int(res.rounds)
    if rounds != ROUNDS_EXPECTED:
        print(
            f"WARNING: round-count parity broken: {rounds} != {ROUNDS_EXPECTED}",
            file=sys.stderr,
        )

    # transport calibration: empty executable + scalar fetch
    trivial = jax.jit(lambda x: x + 1.0)
    rtt_ms = _median_ms(lambda: _sync_scalar(trivial(jnp.float32(1.0))))

    wall_ms = _median_ms(lambda: _sync_scalar(solve(H).eigenvalue))
    device_ms = max(wall_ms - rtt_ms, 1e-3)

    print(
        json.dumps(
            {
                "metric": "hilbert_8192_e2e_device",
                "value": round(device_ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / device_ms, 2),
                "wall_ms": round(wall_ms, 3),
                "transport_rtt_ms": round(rtt_ms, 3),
                "rounds": rounds,
                "backend": backend,
            }
        )
    )


if __name__ == "__main__":
    main()
