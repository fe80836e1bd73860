"""Does sustained load ramp the chip into the fast state?
Measure chain diff right after idle vs right after ~8 s of matvec load,
alternating, several cycles."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eigen_value_tpu import fixtures
from eigen_value_tpu.config import EPS, MAX_ITR
from eigen_value_tpu.ops.pallas import kernels
from eigen_value_tpu.ops.solver_matvec import solve_matvec_loop

DIM = 8192
CHAIN = 9
CYCLES = 4


def _sync(x):
    return float(np.asarray(x))


def solve(H, s):
    def matvec(ev):
        return kernels.matvec(H, ev, block_rows=64, block_cols=8192) / ev

    ev0 = jnp.ones((DIM,), jnp.float32) * s
    return solve_matvec_loop(H, matvec, EPS, MAX_ITR, ev0=ev0).eigenvalue


def chain(k):
    @jax.jit
    def run(H):
        def step(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
            return solve(H, s)

        return lax.fori_loop(0, k, step, jnp.float32(0.0))

    return run


@jax.jit
def heat(H):
    # ~80 dependent matvec passes = ~30 ms x ... keep chip busy
    def body(i, x):
        return kernels.matvec(H, x, block_rows=64, block_cols=8192)

    return lax.fori_loop(0, 100, body, jnp.ones((DIM,), jnp.float32))[0]


def measure(long, short, H, reps=3):
    tl = ts = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(long(H))
        tl = min(tl, (time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        _sync(short(H))
        ts = min(ts, (time.perf_counter() - t0) * 1e3)
    return (tl - ts) / (CHAIN - 1)


def main():
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    long, short = chain(CHAIN), chain(1)
    _sync(long(H))
    _sync(short(H))
    _sync(heat(H))
    for cyc in range(CYCLES):
        time.sleep(8)  # idle
        cold = measure(long, short, H)
        for _ in range(6):  # ~8 s of sustained load
            _sync(heat(H))
        hot = measure(long, short, H)
        print(f"cycle {cyc}: after-idle {cold:6.3f} ms   after-load {hot:6.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
