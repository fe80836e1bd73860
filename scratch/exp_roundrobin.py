"""Round-robin interleaved comparison: cycle through configs several
times in ONE process so chip-state drift affects all configs equally.
Report per-config min and per-cycle values."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eigen_value_tpu import fixtures
from eigen_value_tpu.config import EPS, MAX_ITR
from eigen_value_tpu.ops.pallas import kernels
from eigen_value_tpu.ops.solver import stop_check
from eigen_value_tpu.ops.solver_matvec import solve_matvec_loop

DIM = 8192
ROUNDS = 17
CHAIN = 9
CYCLES = 5
REPS_PER_CYCLE = 3


def _sync(x):
    return float(np.asarray(x))


def chain(solve, k):
    @jax.jit
    def run(H):
        def step(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
            return solve(H, s)

        return lax.fori_loop(0, k, step, jnp.float32(0.0))

    return run


def pure(br, bc):
    def solve(H, s):
        x0 = jnp.ones((DIM,), H.dtype) * s

        def body(i, x):
            return kernels.matvec(H, x, block_rows=br, block_cols=bc)

        return lax.fori_loop(0, ROUNDS, body, x0)[0]

    return solve


def nocond(br, bc):
    kw = dict(block_rows=br, block_cols=bc)

    def solve(H, s):
        def matvec(ev):
            return kernels.matvec(H, ev, **kw) / ev

        n = H.shape[0]
        ev0 = jnp.ones((n,), H.dtype) * s
        v0 = matvec(ev0)

        def cond(c):
            ev, v, lam, i = c
            return (i < MAX_ITR) & jnp.logical_not(stop_check(v, EPS))

        def body(c):
            ev, v, lam, i = c
            m = jnp.max(v)
            ev = ev * (v / m)
            lam = v[0]
            return (ev, matvec(ev), lam, i + 1)

        init = (ev0, v0, jnp.asarray(0.0, H.dtype), jnp.asarray(0, jnp.int32))
        ev, v, lam_prev, i = lax.while_loop(cond, body, init)
        return jnp.where(i < MAX_ITR, v[0], lam_prev)

    return solve


def prod(br, bc):
    kw = dict(block_rows=br, block_cols=bc)

    def solve(H, s):
        def matvec(ev):
            evs = ev * s
            return kernels.matvec(H, evs, **kw) / evs

        return solve_matvec_loop(H, matvec, EPS, MAX_ITR).eigenvalue

    return solve


CONFIGS = [
    ("pure 512x512 ", pure(512, 512)),
    ("pure 64x8192 ", pure(64, 8192)),
    ("pure 512x2048", pure(512, 2048)),
    ("prod 512x512 ", prod(512, 512)),
    ("nocond 512x512 ", nocond(512, 512)),
    ("nocond 64x8192 ", nocond(64, 8192)),
    ("nocond 512x2048", nocond(512, 2048)),
]


def main():
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    runs = {}
    for name, solve in CONFIGS:
        runs[name] = (chain(solve, CHAIN), chain(solve, 1))
        _sync(runs[name][0](H))  # compile
        _sync(runs[name][1](H))
    results = {name: [] for name, _ in CONFIGS}
    for cyc in range(CYCLES):
        for name, _ in CONFIGS:
            long, short = runs[name]
            tl = ts = float("inf")
            for _ in range(REPS_PER_CYCLE):
                t0 = time.perf_counter()
                _sync(long(H))
                tl = min(tl, (time.perf_counter() - t0) * 1e3)
                t0 = time.perf_counter()
                _sync(short(H))
                ts = min(ts, (time.perf_counter() - t0) * 1e3)
            results[name].append((tl - ts) / (CHAIN - 1))
    for name, vals in results.items():
        s = " ".join(f"{v:6.3f}" for v in vals)
        print(f"{name}: min={min(vals):6.3f}  cycles: {s}", flush=True)


if __name__ == "__main__":
    main()
