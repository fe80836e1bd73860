"""Round-2 experiment: why does the in-loop matvec cost ~376 us/round vs
314 us standalone?  Isolate: kernel-in-loop floor (no glue, fori), glue
cost, while-vs-fori, block shapes, XLA-vs-Pallas.

Each variant runs "one solve" = 17 dependent matvec rounds; chained
differencing over CHAIN solves cancels launch latency.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eigen_value_tpu import fixtures
from eigen_value_tpu.config import EPS
from eigen_value_tpu.ops.pallas import kernels
from eigen_value_tpu.ops.solver import stop_check

DIM = 8192
ROUNDS = 17
CHAIN = 9
REPEATS = 7


def _sync(x):
    return float(np.asarray(x))


def _min_ms(fn, reps=REPEATS):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


def pure_pallas(br, bc):
    def solve(H, s):
        x0 = jnp.ones((DIM,), H.dtype) * s

        def body(i, x):
            return kernels.matvec(H, x, block_rows=br, block_cols=bc)

        x = lax.fori_loop(0, ROUNDS, body, x0)
        return x[0]

    return solve


def pure_xla(H, s):
    x0 = jnp.ones((DIM,), H.dtype) * s

    def body(i, x):
        return H @ x

    return lax.fori_loop(0, ROUNDS, body, x0)[0]


def glue_fori(H, s):
    ev0 = jnp.ones((DIM,), H.dtype) * s

    def mv(ev):
        return kernels.matvec(H, ev, block_rows=512, block_cols=512) / ev

    v0 = mv(ev0)

    def body(i, c):
        ev, v = c
        m = jnp.max(v)
        ev = ev * (v / m)
        return ev, mv(ev)

    ev, v = lax.fori_loop(0, ROUNDS, body, (ev0, v0))
    return v[0]


def glue_while(H, s):
    ev0 = jnp.ones((DIM,), H.dtype) * s

    def mv(ev):
        return kernels.matvec(H, ev, block_rows=512, block_cols=512) / ev

    v0 = mv(ev0)

    def cond(c):
        return c[2] < ROUNDS

    def body(c):
        ev, v, i = c
        m = jnp.max(v)
        ev = ev * (v / m)
        return ev, mv(ev), i + 1

    ev, v, i = lax.while_loop(cond, body, (ev0, v0, jnp.asarray(0, jnp.int32)))
    return v[0]


def glue_while_stopcond(H, s):
    """Stop check in cond, but trip count forced to ROUNDS via max_itr —
    Hilbert 8192 converges at exactly 17, so this runs the same 18 matvecs
    as production."""
    ev0 = jnp.ones((DIM,), H.dtype) * s

    def mv(ev):
        return kernels.matvec(H, ev, block_rows=512, block_cols=512) / ev

    v0 = mv(ev0)

    def cond(c):
        ev, v, i = c
        return (i < 1000) & jnp.logical_not(stop_check(v, EPS))

    def body(c):
        ev, v, i = c
        m = jnp.max(v)
        ev = ev * (v / m)
        return ev, mv(ev), i + 1

    ev, v, i = lax.while_loop(cond, body, (ev0, v0, jnp.asarray(0, jnp.int32)))
    return v[0]


def chain(solve, k):
    @jax.jit
    def run(H):
        def step(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
            return solve(H, s)

        return lax.fori_loop(0, k, step, jnp.float32(0.0))

    return run


def measure(solve, name):
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    long, short = chain(solve, CHAIN), chain(solve, 1)
    _sync(long(H))
    t_long = _min_ms(lambda: _sync(long(H)))
    t_short = _min_ms(lambda: _sync(short(H)))
    ms = (t_long - t_short) / (CHAIN - 1)
    print(f"{name}: {ms:7.3f} ms/solve = {ms/ROUNDS*1e3:6.1f} us/round",
          flush=True)


if __name__ == "__main__":
    measure(pure_pallas(512, 512), "pure_pallas 512x512 ")
    measure(pure_pallas(512, 1024), "pure_pallas 512x1024")
    measure(pure_pallas(1024, 1024), "pure_pallas 1024x1024")
    measure(pure_pallas(2048, 512), "pure_pallas 2048x512")
    measure(pure_pallas(512, 8192), "pure_pallas 512x8192")
    measure(pure_xla, "pure_xla            ")
    measure(glue_fori, "glue_fori  512x512  ")
    measure(glue_while, "glue_while 512x512  ")
    measure(glue_while_stopcond, "glue_while_stopcond ")
