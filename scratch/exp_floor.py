"""Pin the true sustained HBM read floor and the matvec kernel's distance
from it.  Long chains (k=128), several repeats, printed individually so
run-to-run spread is visible.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eigen_value_tpu import fixtures
from eigen_value_tpu.ops.pallas import kernels

DIM = 8192
K = 128
eps32 = jnp.asarray(1e-38, jnp.float32)


def _read_kernel(a_ref, out_ref):
    part = jnp.sum(a_ref[...], axis=1, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = part

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[...] += part


@functools.partial(jax.jit, static_argnames=("br", "bc", "dimsem"))
def pure_read(A, br=512, bc=512, dimsem=None):
    n = A.shape[0]
    params = {}
    if dimsem is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=dimsem
        )
    out = pl.pallas_call(
        _read_kernel,
        grid=(n // br, n // bc),
        in_specs=[pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), A.dtype),
        **params,
    )(A)
    return out[:, 0]


def time_marginal_verbose(step, init, k=K, reps=9, name=""):
    def chain(m):
        @jax.jit
        def run(state):
            return lax.fori_loop(0, m, step, state)

        return run

    run1, runk = chain(1), chain(k + 1)

    def force(o):
        return float(np.asarray(jax.tree_util.tree_leaves(o)[-1].ravel()[0]))

    force(run1(init))
    force(runk(init))
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(run1(init))
        t1 = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        force(runk(init))
        tk = (time.perf_counter() - t0) * 1e3
        vals.append((tk - t1) / k * 1e3)
    vals = sorted(vals)
    gbps = DIM * DIM * 4 / (vals[0] * 1e-6) / 1e9
    print(
        f"{name}: min={vals[0]:6.1f} med={vals[len(vals)//2]:6.1f} "
        f"max={vals[-1]:6.1f} us  (min->{gbps:5.0f} GB/s)",
        flush=True,
    )
    return vals[0]


def main():
    A = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    v = jnp.sum(A, axis=1)
    ones = jnp.ones((DIM,), jnp.float32)

    def read_step(dimsem=None, br=512, bc=512):
        def step(i, s):
            Ai, acc = s
            out = pure_read(Ai + acc[0] * eps32, br=br, bc=bc, dimsem=dimsem)
            return (Ai, out)

        return step

    # NOTE: Ai + acc*eps32 materializes a copy! That's read+write. Instead
    # thread dependence through a bias on the output only:
    def read_step2(dimsem=None, br=512, bc=512):
        def step(i, s):
            Ai, acc = s
            out = pure_read(Ai, br=br, bc=bc, dimsem=dimsem) + acc[0] * eps32
            return (Ai, out)

        return step

    def mv_step(i, s):
        Ai, xi = s
        return (Ai, kernels.matvec(Ai, xi, block_rows=512, block_cols=512))

    # CAREFUL: read_step2's pallas call takes loop-invariant A only — XLA
    # may hoist it. Check: output depends on acc only through the +bias...
    # the pallas call itself IS loop-invariant. So read_step2 is hoistable
    # — use mv_step with xi evolving as the honest floor probe, plus
    # read_step (paying a copy, reported for reference).
    time_marginal_verbose(mv_step, (A, ones), name="matvec 512x512       ")
    time_marginal_verbose(mv_step, (A, ones), name="matvec 512x512 (rep) ")

    def mv_step_ds(dimsem):
        def step(i, s):
            Ai, xi = s
            return (Ai, matvec_ds(Ai, xi, dimsem))

        return step

    @functools.partial(jax.jit, static_argnames=("dimsem",))
    def matvec_ds(A, x, dimsem):
        n = A.shape[0]
        br = bc = 512
        out = pl.pallas_call(
            kernels._matvec_kernel,
            grid=(n // br, n // bc),
            in_specs=[
                pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 1), A.dtype),
            compiler_params=pltpu.CompilerParams(dimension_semantics=dimsem),
        )(A, x[None, :])
        return out[:, 0]

    time_marginal_verbose(
        mv_step_ds(("parallel", "arbitrary")), (A, ones),
        name="matvec ds=(par,arb)  ",
    )
    time_marginal_verbose(
        mv_step_ds(("arbitrary", "arbitrary")), (A, ones),
        name="matvec ds=(arb,arb)  ",
    )


if __name__ == "__main__":
    main()
