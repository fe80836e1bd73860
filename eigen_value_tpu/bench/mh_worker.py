"""Multi-process worker — one simulated "host" of the multi-host flow.

The single home of the multi-process bootstrap dance (env pinned before
jax import, host-local Hilbert row block, assemble_rowsharded): spawned
by ``bench_multihost`` (suite.py) for the scaling report AND by
tests/test_multihost.py for the 2-process parity test.  Standalone:

    python -m eigen_value_tpu.bench.mh_worker --process-id 0 \
        --num-processes 2 --coordinator 127.0.0.1:PORT --dim 2048

Each process owns ``--local-devices`` virtual CPU devices and ONLY its own
contiguous block of Hilbert rows (the host-local placement of the real
multi-host flow, parallel/multihost.py); emits one JSON line with the
solve result, the global eigen-pair residual, and min wall time over
``--reps`` timed solves.  With ``--num-processes 1`` no process group is
formed — the single-"host" baseline for scaling efficiency.
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
    p.add_argument(
        "--solver",
        choices=["gather", "ring", "2d"],
        default="gather",
        help="per-round exchange: all_gather, ring-pipelined ppermute, or "
        "2D block sharding (psum along local devices + rows gather)",
    )
    p.add_argument(
        "--measure-exchange",
        action="store_true",
        help="instead of solving, time the bare per-round all_gather at "
        "several vector lengths (scaling-model calibration input)",
    )
    args = p.parse_args()

    # Env must be pinned before jax import (same dance as tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
    # Standalone hermeticity: when invoked directly (not via the suite's
    # hermetic_cpu_env) a registered remote-TPU plugin would still be
    # initialized on first backend use regardless of JAX_PLATFORMS — drop
    # its factory so a wedged tunnel can never hang a CPU/gloo worker.
    from eigen_value_tpu.device import unregister_remote_tpu_plugin

    unregister_remote_tpu_plugin()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eigen_value_tpu.parallel import multihost, solve_sharded_matvec_ring

    if args.num_processes > 1:
        multihost.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    # The mesh is pinned to the CPU platform: an auxiliary accelerator
    # plugin (e.g. a tunneled TPU) may register despite JAX_PLATFORMS and
    # must not join the process group's mesh.  --measure-exchange always
    # uses the 1D row mesh: the calibration protocol (and its
    # fit_exchange P) is defined on the all-devices rows gather, and a 2D
    # mesh would silently shrink the gather to the process axis while
    # still reporting shards = all devices.
    if args.solver == "2d" and not args.measure_exchange:
        mesh = multihost.make_global_mesh2d(platform="cpu")
    else:
        mesh = multihost.make_global_row_mesh(platform="cpu")

    if args.measure_exchange:
        # Bare per-round exchange: all_gather of an n-length f32 vector
        # from n/P-shards, timed marginally (chained k applications minus
        # one, dispatch cancels) at several n — the calibration input for
        # utils/scaling_model.fit_exchange.
        from jax.sharding import NamedSharding, PartitionSpec as P

        try:  # jax >= 0.6
            shard_map = jax.shard_map
        except AttributeError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map

        n_dev = len(mesh.devices.flat)
        eps32 = jnp.float32(1e-38)
        k = 16  # gloo gathers are ~ms: a short chain already dominates
        dims = (args.dim, args.dim * 4, args.dim * 16)

        def gather_chain(m):
            def body(x_loc):
                def step(i, xl):
                    g = jax.lax.all_gather(xl, "rows", tiled=True)
                    return xl + g[0] * eps32  # dependence, O(n/P)

                return jax.lax.fori_loop(0, m, step, x_loc)

            return shard_map(
                body, mesh=mesh, in_specs=P("rows"), out_specs=P("rows")
            )

        # Establish the gloo context FIRST with one tiny gather: context
        # creation has a ~30 s handshake deadline, and the heavy chain
        # compiles below can skew the two processes past it (they compete
        # for the same host CPUs); a cheap collective while the processes
        # are still in lockstep creates the 8-device context once, and
        # every later executable reuses it.
        warm = jax.jit(
            shard_map(
                lambda xl: jax.lax.all_gather(xl, "rows", tiled=True),
                mesh=mesh,
                in_specs=P("rows"),
                out_specs=P(),
                check_vma=False,  # gathered result is replicated by construction
            )
        )
        jax.block_until_ready(
            warm(
                jax.device_put(
                    np.ones((8 * n_dev,), np.float32),
                    NamedSharding(mesh, P("rows")),
                )
            )
        )

        xs, compiled = {}, {}
        for n in dims:
            # a GLOBAL sharded input: every process supplies the full host
            # array, device_put slices out the local shards (a plain
            # jnp.ones would be process-local and cannot feed a
            # cross-process jit)
            xs[n] = jax.device_put(
                np.ones((n,), np.float32), NamedSharding(mesh, P("rows"))
            )
            compiled[n] = tuple(
                jax.jit(gather_chain(m)).lower(xs[n]).compile()
                for m in (1, k + 1)
            )
        out = {}
        for n in dims:
            x = xs[n]
            r1, rk = compiled[n]
            jax.block_until_ready(r1(x))
            jax.block_until_ready(rk(x))
            t1 = tk = float("inf")
            for _ in range(args.reps + 2):
                t0 = time.perf_counter()
                jax.block_until_ready(r1(x))
                t1 = min(t1, time.perf_counter() - t0)
                t0 = time.perf_counter()
                jax.block_until_ready(rk(x))
                tk = min(tk, time.perf_counter() - t0)
            out[n] = max(tk - t1, 0.0) / k * 1e6  # µs per gather
        print(
            json.dumps(
                {
                    "process_id": args.process_id,
                    "num_processes": len(
                        {d.process_index for d in mesh.devices.flat}
                    ),
                    "shards": n_dev,
                    "exchange_us": out,
                }
            ),
            flush=True,
        )
        return 0

    # This process's row block of the Hilbert matrix, generated locally
    # with the fixture's exact arithmetic (int divisor, f32 reciprocal —
    # fixtures.hilbert_matrix / reference utils.cpp:137-154).
    n = args.dim
    n_local = n // args.num_processes
    row0 = args.process_id * n_local
    r = np.arange(row0, row0 + n_local, dtype=np.int32)[:, None]
    c = np.arange(n, dtype=np.int32)[None, :]
    local_rows = np.float32(1.0) / (r + c + 1).astype(np.float32)
    if args.solver == "2d":
        from eigen_value_tpu.parallel import solve_sharded_2d

        A = multihost.assemble_blocksharded(local_rows, mesh)
    else:
        A = multihost.assemble_rowsharded(local_rows, mesh)

    def solve():
        if args.solver == "2d":
            return jax.block_until_ready(solve_sharded_2d(A, mesh))
        if args.solver == "ring":
            return jax.block_until_ready(solve_sharded_matvec_ring(A, mesh))
        return jax.block_until_ready(multihost.solve_multihost(A, mesh=mesh))

    res = solve()  # warm / compile
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        res = solve()
        ts.append((time.perf_counter() - t0) * 1e3)
    ms = min(ts) if ts else float("nan")
    lam, rounds = float(np.asarray(res.eigenvalue)), int(res.rounds)

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
                "num_processes": len({d.process_index for d in mesh.devices.flat}),
                "global_devices": len(mesh.devices.flat),
                "dim": n,
                "rounds": rounds,
                "eigenvalue": lam,
                "converged": bool(res.converged),
                "residual": float(residual),
                "ms": ms,
                "elems_per_s": multihost.elems_per_second(n, rounds, ms * 1e-3),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
