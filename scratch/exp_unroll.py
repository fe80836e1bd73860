"""Is the ~45 us/round in-loop penalty the lax loop iteration boundary?
Compare: straight-line 17 dependent matvecs vs fori_loop vs fori unroll=k.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eigen_value_tpu import fixtures
from eigen_value_tpu.ops.pallas import kernels

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


def mv(H, x):
    return kernels.matvec(H, x, block_rows=512, block_cols=512)


def straightline(H, s):
    x = jnp.ones((DIM,), H.dtype) * s
    for _ in range(ROUNDS):
        x = mv(H, x)
    return x[0]


def fori(unroll):
    def solve(H, s):
        x0 = jnp.ones((DIM,), H.dtype) * s
        return lax.fori_loop(
            0, ROUNDS, lambda i, x: mv(H, x), x0, unroll=unroll
        )[0]

    return solve


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
    measure(straightline, "straightline x17")
    measure(fori(1), "fori unroll=1   ")
    measure(fori(2), "fori unroll=2   ")
    measure(fori(4), "fori unroll=4   ")
