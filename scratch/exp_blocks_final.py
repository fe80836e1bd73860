"""High-precision interleaved A/B: 512x512 vs full-row 64x8192 blocks,
pure 17-round chains, CHAIN=17, 8 cycles."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eigen_value_tpu import fixtures
from eigen_value_tpu.ops.pallas import kernels

DIM = 8192
ROUNDS = 17
CHAIN = 17
CYCLES = 8
REPS = 2


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


CONFIGS = [
    ("512x512", pure(512, 512)),
    ("64x8192", pure(64, 8192)),
]


def main():
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    runs = {}
    for name, solve in CONFIGS:
        runs[name] = (chain(solve, CHAIN), chain(solve, 1))
        _sync(runs[name][0](H))
        _sync(runs[name][1](H))
    res = {n: [] for n, _ in CONFIGS}
    for _ in range(CYCLES):
        for name, _ in CONFIGS:
            long, short = runs[name]
            tl = ts = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                _sync(long(H))
                tl = min(tl, (time.perf_counter() - t0) * 1e3)
                t0 = time.perf_counter()
                _sync(short(H))
                ts = min(ts, (time.perf_counter() - t0) * 1e3)
            res[name].append((tl - ts) / (CHAIN - 1))
    for name, vals in res.items():
        s = " ".join(f"{v:5.2f}" for v in vals)
        print(
            f"{name}: min={min(vals):6.3f} ms "
            f"({min(vals)/ROUNDS*1e3:5.1f} us/pass)  cycles: {s}",
            flush=True,
        )


if __name__ == "__main__":
    main()
