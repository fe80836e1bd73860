"""Is XLA's fused elementwise+reduce codegen faster than the Pallas
matvec?  Interleaved time_marginal comparison in ONE process, 3 cycles."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eigen_value_tpu import fixtures
from eigen_value_tpu.ops.pallas import kernels

DIM = 8192
K = 64
eps32 = jnp.asarray(1e-38, jnp.float32)


def chainfns(step):
    def chain(m):
        @jax.jit
        def run(state):
            return lax.fori_loop(0, m, step, state)

        return run

    return chain(1), chain(K + 1)


def force(o):
    return float(np.asarray(jax.tree_util.tree_leaves(o)[-1].ravel()[0]))


def main():
    A = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    ones = jnp.ones((DIM,), jnp.float32)
    v = jnp.sum(A, axis=1)

    def rowsum_xla(i, s):
        Ai, vi = s
        return (Ai, jnp.sum(Ai + vi[0] * eps32, axis=1))

    def mulsum_xla(i, s):
        # matvec as fused broadcast-multiply + row reduce (x evolves)
        Ai, xi = s
        return (Ai, jnp.sum(Ai * xi[None, :], axis=1))

    def mulsum_div_xla(i, s):
        # the full production round op: v = sum(A * ev) / ev
        Ai, xi = s
        return (Ai, jnp.sum(Ai * xi[None, :], axis=1) / xi)

    def matvec_xla(i, s):
        Ai, xi = s
        return (Ai, Ai @ xi)

    def matvec_pallas(i, s):
        Ai, xi = s
        return (Ai, kernels.matvec(Ai, xi, block_rows=64, block_cols=8192))

    cases = {
        "rowsum_xla    ": (rowsum_xla, (A, v)),
        "mulsum_xla    ": (mulsum_xla, (A, ones)),
        "mulsum_div_xla": (mulsum_div_xla, (A, ones)),
        "matvec_xla    ": (matvec_xla, (A, ones)),
        "matvec_pallas ": (matvec_pallas, (A, ones)),
    }
    runs = {}
    for name, (step, init) in cases.items():
        r1, rk = chainfns(step)
        force(r1(init))
        force(rk(init))
        runs[name] = (r1, rk, init)
    res = {n: [] for n in cases}
    for cyc in range(3):
        for name in cases:
            r1, rk, init = runs[name]
            t1 = tk = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                force(r1(init))
                t1 = min(t1, (time.perf_counter() - t0) * 1e3)
                t0 = time.perf_counter()
                force(rk(init))
                tk = min(tk, (time.perf_counter() - t0) * 1e3)
            res[name].append(max(tk - t1, 0.0) / K * 1e3)
    for name, vals in res.items():
        best = min(vals)
        gbps = DIM * DIM * 4 / (best * 1e-9) / 1e18
        s = " ".join(f"{v:6.1f}" for v in vals)
        print(f"{name}: min={best:6.1f} us ({gbps:5.0f} GB/s)  cycles: {s}",
              flush=True)


if __name__ == "__main__":
    main()
