"""Worker process for the real multi-process multi-host test.

Launched (2×) by tests/test_multihost.py.  Each process owns 4 virtual CPU
devices and only ITS OWN contiguous block of Hilbert rows — the global
32768²-style flow (BASELINE config 5) at CI scale: jax.distributed
bootstrap → host-local fixture block → assemble_rowsharded →
solve_multihost → one JSON result line on stdout.

Not a pytest file (no ``test_`` prefix); run directly:
    python tests/multihost_worker.py --process-id 0 --num-processes 2 \
        --coordinator 127.0.0.1:PORT --dim 256
"""

import argparse
import json
import os
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument(
        "--solver",
        choices=["gather", "ring"],
        default="gather",
        help="per-round exchange: all_gather vs ring-pipelined ppermute",
    )
    args = p.parse_args()

    # Env must be pinned before jax import (same dance as tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eigen_value_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    # The mesh is pinned to the CPU platform: an auxiliary accelerator
    # plugin (e.g. a tunneled TPU) may register despite JAX_PLATFORMS and
    # must not join the process group's mesh.
    mesh = multihost.make_global_row_mesh(platform="cpu")

    # This process's row block of the Hilbert matrix, generated locally
    # with the fixture's exact arithmetic (int divisor, f32 reciprocal —
    # fixtures.hilbert_matrix / reference utils.cpp:137-154).
    n = args.dim
    n_local = n // args.num_processes
    row0 = args.process_id * n_local
    r = np.arange(row0, row0 + n_local, dtype=np.int32)[:, None]
    c = np.arange(n, dtype=np.int32)[None, :]
    local_rows = np.float32(1.0) / (r + c + 1).astype(np.float32)

    A = multihost.assemble_rowsharded(local_rows, mesh)
    if args.solver == "ring":
        from eigen_value_tpu.parallel import solve_sharded_matvec_ring

        res = jax.block_until_ready(solve_sharded_matvec_ring(A, mesh))
    else:
        res = jax.block_until_ready(multihost.solve_multihost(A, mesh=mesh))

    # Global eigen-pair residual max|A·v − λ·v| computed on the mesh
    # (A stays row-sharded; GSPMD inserts the ev all-gather).
    residual = jax.jit(
        lambda A, ev, lam: jnp.max(jnp.abs(A @ ev - lam * ev)),
        out_shardings=NamedSharding(mesh, P()),
    )(A, res.eigenvector, res.eigenvalue)

    print(
        json.dumps(
            {
                "process_id": args.process_id,
                # counted over the mesh's devices: the default backend may
                # be an auxiliary plugin with a single-process view
                "num_processes": len(
                    {d.process_index for d in mesh.devices.flat}
                ),
                "global_devices": len(mesh.devices.flat),
                "eigenvalue": float(res.eigenvalue),
                "rounds": int(res.rounds),
                "converged": bool(res.converged),
                "residual": float(residual),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
