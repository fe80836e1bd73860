"""In-loop matvec block sweep including FULL-ROW blocks (bc = n):
no output revisits, no repeated x fetches, 1-D effective grid.
Chained full solves (17 rounds) like bench.py.
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


def pure(br, bc):
    def solve(H, s):
        x0 = jnp.ones((DIM,), H.dtype) * s

        def body(i, x):
            return kernels.matvec(H, x, block_rows=br, block_cols=bc)

        return lax.fori_loop(0, ROUNDS, body, x0)[0]

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
    try:
        _sync(long(H))
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:100]}", flush=True)
        return
    t_long = _min_ms(lambda: _sync(long(H)))
    t_short = _min_ms(lambda: _sync(short(H)))
    ms = (t_long - t_short) / (CHAIN - 1)
    print(f"{name}: {ms:7.3f} ms = {ms/ROUNDS*1e3:6.1f} us/round", flush=True)


if __name__ == "__main__":
    for br, bc in [
        (64, 8192),
        (128, 8192),
        (256, 8192),
        (256, 4096),
        (512, 2048),
        (512, 512),
    ]:
        measure(pure(br, bc), f"pure {br:4d}x{bc:4d}")
