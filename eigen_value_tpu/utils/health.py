"""Device health diagnostics for production serving.

The reference assumed a healthy local device (its only failure handling
was the MAX_ITR cap — include/similarity_transform.hpp:5); a remote TPU
behind a network tunnel adds failure modes the reference never had, all
observed in practice on this deployment:

- the tunnel WEDGES: a device RPC blocks forever, and because the hang is
  inside a C call no Python-level timeout or signal handler can interrupt
  it — the only safe probe is a *separate process* with a deadline;
- ``jax.devices()`` may still answer (cached registry) while every
  compute call hangs — device *listing* is not a health check;
- the chip's sustained-HBM state drifts between ~745 and ~930 GB/s on a
  minutes timescale, silently changing solve latency by ±10%.

``check()`` turns those into one structured, deadline-bounded report a
serving layer can act on (route away, retry later, re-baseline SLOs).
CLI: ``python -m eigen_value_tpu.utils.health [--deadline-s N]``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import Optional

# Runs in a fresh interpreter: must be self-contained and print one float
# (the per-call wall ms of a trivial device round-trip, warm).
_PROBE_SRC = """
import os, time
import jax, jax.numpy as jnp
if os.environ.get("EVT_HEALTH_DEVICE") == "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
f = jax.jit(lambda x: x + 1.0)
y = f(jnp.float32(0.0))
y.block_until_ready()  # compile
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    f(jnp.float32(1.0)).block_until_ready()
    ts.append((time.perf_counter() - t0) * 1e3)
print(list(y.devices())[0].platform)
print(min(ts))
"""


def probe(deadline_s: float = 60.0, device: Optional[str] = None) -> dict:
    """Deadline-bounded liveness + launch-latency probe of the default
    device (or ``device="cpu"``), isolated in a subprocess so a wedged
    runtime cannot hang the caller.  Returns ``{"alive": bool,
    "platform": str|None, "rtt_ms": float|None, "probe_s": float}``;
    ``alive=False`` means the probe missed its deadline or crashed —
    treat the device as unusable.

    ``rtt_ms`` is a TINY-executable round-trip — a liveness latency floor,
    NOT the per-launch cost of real programs (on the tunneled TPU a tiny
    op round-trips in ~0.1-0.3 ms while an 8192² solve launch pays
    ~30 ms; scheduling estimates should use the large-program figure,
    e.g. ``EigenValue``'s per-instance launch measurement)."""
    t0 = time.perf_counter()
    env = dict(os.environ)
    if device:
        env["EVT_HEALTH_DEVICE"] = device
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=deadline_s,
            env=env,
        )
        alive = out.returncode == 0
        lines = out.stdout.strip().splitlines()
        platform = lines[-2] if alive else None
        rtt = float(lines[-1]) if alive else None
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        alive, rtt, platform = False, None, None
    return {
        "alive": alive,
        "platform": platform,
        "rtt_ms": round(rtt, 3) if rtt is not None else None,
        "probe_s": round(time.perf_counter() - t0, 1),
    }


def chip_state(dim: int = 4096, windows: int = 2, gap_s: float = 1.0) -> dict:
    """Measure the chip's current sustained state: the production matvec
    marginal (``bench_drift``'s measurement) summarized to min/max GB/s.
    Call only after ``probe()`` reports alive — this runs in-process."""
    from ..bench.suite import bench_drift

    rows = bench_drift(dim=dim, windows=windows, gap_s=gap_s, k=32)
    gbps = [
        r["gbps"]
        for r in rows
        if r["bench"] == "drift" and r["gbps"] and not r["suspect"]
    ]
    summary = rows[-1]
    return {
        "dim": dim,
        "windows": windows,
        "gbps_min": round(min(gbps)) if gbps else None,
        "gbps_max": round(max(gbps)) if gbps else None,
        "spread_pct": summary.get("spread_pct"),
        "suspect_windows": summary.get("suspect_windows"),
    }


def check(
    deadline_s: float = 60.0,
    state_dim: Optional[int] = 4096,
    device: Optional[str] = None,
) -> dict:
    """Full health report: liveness (always, subprocess-isolated) plus the
    chip-state reading (in-process, only when alive; pass
    ``state_dim=None`` to skip).  Shape::

        {"alive": bool, "rtt_ms": ..., "probe_s": ...,
         "state": {...} | None}
    """
    rep = probe(deadline_s, device=device)
    rep["state"] = None
    if rep["alive"] and state_dim:
        if device == "cpu":
            import jax

            jax.config.update("jax_default_device", jax.devices("cpu")[0])
        rep["state"] = chip_state(dim=state_dim)
    return rep


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="eigen_value_tpu.utils.health")
    p.add_argument("--deadline-s", type=float, default=60.0)
    p.add_argument(
        "--state-dim",
        type=int,
        default=4096,
        help="matrix dim for the chip-state reading (0 = liveness only)",
    )
    p.add_argument("--device", choices=["cpu"], help="probe the CPU instead")
    args = p.parse_args(argv)
    rep = check(args.deadline_s, args.state_dim or None, device=args.device)
    print(json.dumps(rep))
    return 0 if rep["alive"] else 1


if __name__ == "__main__":
    sys.exit(main())
