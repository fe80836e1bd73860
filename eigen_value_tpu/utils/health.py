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
  minutes timescale, silently changing solve latency by ±10%;
- the tunnel SERIALIZES clients: while another process runs a long job,
  this process's calls queue — a busy tunnel is indistinguishable from a
  wedged one to a short-deadline probe.  Probe from an otherwise-idle
  client, or size ``deadline_s`` to cover the longest job that could be
  ahead in the queue.

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

from ..device import hermetic_cpu_env

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
    # A CPU probe answers "is the HOST healthy" and must not depend on
    # tunnel health — hermetic_cpu_env keeps the child from initializing
    # the (possibly wedged) remote-TPU plugin, which jax would otherwise
    # do regardless of the default-device pin.
    env = hermetic_cpu_env() if device == "cpu" else dict(os.environ)
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


def _state_subprocess(
    state_dim: int, deadline_s: float, device: Optional[str]
) -> tuple:
    """chip_state() in a deadline-bounded subprocess (the tunnel can wedge
    BETWEEN the liveness probe and the state reading — an in-process
    reading would hang the caller forever).  Returns (state|None, error|None)."""
    cmd = [
        sys.executable,
        "-m",
        "eigen_value_tpu.utils.health",
        "--state-only",
        "--state-dim",
        str(state_dim),
    ]
    if device == "cpu":
        cmd += ["--device", "cpu"]
    env = dict(os.environ)
    # The child must import this package even when the caller added it to
    # sys.path at runtime (e.g. a checkout, no install).
    env["PYTHONPATH"] = os.pathsep.join(
        [p for p in sys.path if p] + [env.get("PYTHONPATH", "")]
    ).strip(os.pathsep)
    if device == "cpu":
        # AFTER the sys.path merge: sys.path contains the plugin's
        # sitecustomize dir whenever the parent runs under the tunnel, and
        # re-exporting it would re-register the backend the hermetic env
        # exists to keep out of the child.
        env = hermetic_cpu_env(env)
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=deadline_s, env=env
        )
        if out.returncode != 0:
            return None, f"state reader exited {out.returncode}"
        return json.loads(out.stdout.strip().splitlines()[-1]), None
    except subprocess.TimeoutExpired:
        return None, f"state deadline {deadline_s:.0f}s exceeded (wedged?)"
    except (ValueError, IndexError) as e:
        return None, f"unparseable state output: {e}"


def check(
    deadline_s: float = 60.0,
    state_dim: Optional[int] = "auto",
    device: Optional[str] = None,
    state_deadline_s: float = 240.0,
) -> dict:
    """Full health report: liveness plus the chip-state reading, each in
    its own deadline-bounded subprocess (pass ``state_dim=None`` to skip
    the state; the default "auto" reads the state at 4096 on the device
    and SKIPS it for ``device="cpu"`` — a host-health probe has no chip
    state, and the interpret-mode reading grinds for minutes).  Shape::

        {"alive": bool, "platform": ..., "rtt_ms": ..., "probe_s": ...,
         "state": {...} | None, "state_error": str | None}

    ``state_error`` is set when the state reading failed or missed its
    deadline — e.g. the tunnel wedged between probe and reading."""
    if state_dim == "auto":
        state_dim = None if device == "cpu" else 4096
    rep = probe(deadline_s, device=device)
    rep["state"] = None
    rep["state_error"] = None
    if rep["alive"] and state_dim:
        rep["state"], rep["state_error"] = _state_subprocess(
            state_dim, state_deadline_s, device
        )
    return rep


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="eigen_value_tpu.utils.health")
    p.add_argument("--deadline-s", type=float, default=60.0)
    p.add_argument(
        "--state-dim",
        type=int,
        default=None,
        help="matrix dim for the chip-state reading (0 = liveness only; "
        "default 4096 on the device, 0 for --device cpu where the "
        "drift reading is meaningless and interpret-mode slow)",
    )
    p.add_argument("--device", choices=["cpu"], help="probe the CPU instead")
    p.add_argument(
        "--state-only",
        action="store_true",
        help="internal worker mode: print the in-process chip_state JSON",
    )
    args = p.parse_args(argv)
    if args.state_dim is None:
        args.state_dim = 0 if args.device == "cpu" else 4096
    if args.state_only:
        if args.state_dim < 1:
            p.error("--state-only requires --state-dim >= 1")
        if args.device == "cpu":
            from ..device import unregister_remote_tpu_plugin

            # Direct CLI use without a hermetic parent env: make this
            # interpreter CPU-only before the first backend init.
            unregister_remote_tpu_plugin()
            import jax

            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
        print(json.dumps(chip_state(dim=args.state_dim)))
        return 0
    rep = check(args.deadline_s, args.state_dim or None, device=args.device)
    print(json.dumps(rep))
    return 0 if rep["alive"] else 1


if __name__ == "__main__":
    sys.exit(main())
