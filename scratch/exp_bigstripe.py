"""Does raising vmem_limit_bytes + bigger full-row stripes help?
Interleaved pure 17-round chains, one process."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eigen_value_tpu import fixtures
from eigen_value_tpu.ops.pallas.kernels import _matvec_kernel

DIM = 8192
ROUNDS = 17
CHAIN = 9
CYCLES = 4
REPS = 2


@functools.partial(jax.jit, static_argnames=("br", "vmem_mb"))
def matvec_big(A, x, br, vmem_mb):
    n = A.shape[0]
    y = pl.pallas_call(
        _matvec_kernel,
        grid=(n // br, 1),
        in_specs=[
            pl.BlockSpec((br, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), A.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        ),
    )(A, x[None, :])
    return y[:, 0]


def pure(br, vmem_mb):
    def solve(H, s):
        x0 = jnp.ones((DIM,), H.dtype) * s

        def body(i, x):
            return matvec_big(H, x, br, vmem_mb)

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


CONFIGS = [
    ("64  x8192 (16MB lim)", pure(64, 16)),
    ("256 x8192 (64MB lim)", pure(256, 64)),
    ("512 x8192 (100MB lim)", pure(512, 100)),
    ("1024x8192 (110MB lim)", pure(1024, 110)),
]


def main():
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    runs = {}
    for name, s in CONFIGS:
        try:
            long, short = chain(s, CHAIN), chain(s, 1)
            float(np.asarray(long(H)))
            float(np.asarray(short(H)))
            runs[name] = (long, short)
        except Exception as e:
            print(f"{name}: COMPILE FAIL {str(e)[:120]}", flush=True)
    res = {n: [] for n in runs}
    for _ in range(CYCLES):
        for name, (long, short) in runs.items():
            tl = ts = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(np.asarray(long(H)))
                tl = min(tl, (time.perf_counter() - t0) * 1e3)
                t0 = time.perf_counter()
                float(np.asarray(short(H)))
                ts = min(ts, (time.perf_counter() - t0) * 1e3)
            res[name].append((tl - ts) / (CHAIN - 1))
    for name, vals in res.items():
        s = " ".join(f"{v:5.2f}" for v in vals)
        print(f"{name}: min={min(vals):6.3f} ms ({min(vals)/ROUNDS*1e3:5.1f} us/pass)  {s}", flush=True)


if __name__ == "__main__":
    main()
