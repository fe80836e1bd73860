"""Multi-process bench worker — one simulated "host" of the multi-host flow.

Spawned by ``bench_multihost`` (suite.py) and usable standalone:

    python -m eigen_value_tpu.bench.mh_worker --process-id 0 \
        --num-processes 2 --coordinator 127.0.0.1:PORT --dim 2048

Each process owns ``--local-devices`` virtual CPU devices and ONLY its own
contiguous block of Hilbert rows (the host-local placement of the real
multi-host flow, parallel/multihost.py); emits one JSON line with the
solve result and min wall time over ``--reps`` timed solves.  With
``--num-processes 1`` no process group is formed — the single-"host"
baseline for scaling efficiency.
"""

import argparse
import json
import os
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    # Env must be pinned before jax import (same dance as tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()

    import jax
    import numpy as np

    from eigen_value_tpu.parallel import multihost

    if args.num_processes > 1:
        multihost.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    mesh = multihost.make_global_row_mesh(platform="cpu")

    n = args.dim
    n_local = n // args.num_processes
    row0 = args.process_id * n_local
    r = np.arange(row0, row0 + n_local, dtype=np.int32)[:, None]
    c = np.arange(n, dtype=np.int32)[None, :]
    local_rows = np.float32(1.0) / (r + c + 1).astype(np.float32)
    A = multihost.assemble_rowsharded(local_rows, mesh)

    def solve() -> float:
        res = multihost.solve_multihost(A, mesh=mesh)
        return float(np.asarray(res.eigenvalue)), int(res.rounds)

    lam, rounds = solve()  # warm / compile
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        lam, rounds = solve()
        ts.append((time.perf_counter() - t0) * 1e3)
    ms = min(ts)

    print(
        json.dumps(
            {
                "process_id": args.process_id,
                "num_processes": args.num_processes,
                "global_devices": len(mesh.devices.flat),
                "dim": n,
                "rounds": rounds,
                "eigenvalue": lam,
                "ms": ms,
                "elems_per_s": multihost.elems_per_second(n, rounds, ms * 1e-3),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
