"""Injected-regression dry run for the chip-state-relative perf gate
(VERDICT r2 item 8 done-criterion).

The gate (tests/test_tpu_hw.py::test_headline_chain_within_tolerance):
    chain_ms < 18 * pass_marginal * 1.10 + 0.25
with pass_marginal measured in the SAME process (same chip state).

Arms: the real production chain, and an INJECTED +2-extra-O(n²)-passes-
per-solve regression (~11%, the smallest structural unit the chain gate
is meant to catch — per-pass kernel regressions are covered by the
80%-roofline marginal test).  Expected: real passes both bounds;
injected passes the old fixed 8.0 ms bound but FAILS the relative one —
the gap the relative gate closes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eigen_value_tpu import fixtures
from eigen_value_tpu.config import EPS, MAX_ITR
from eigen_value_tpu.device import matvec_blocks
from eigen_value_tpu.ops.pallas import kernels
from eigen_value_tpu.ops.solver_matvec import solve_matvec_loop
from eigen_value_tpu.utils.timing import time_marginal

DIM = 8192
BR, BC = matvec_blocks(DIM)


def mv(H, ev):
    return kernels.matvec(H, ev, block_rows=BR, block_cols=BC)


def chain(k, extra_passes):
    @jax.jit
    def run(H):
        def body(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
            ev0 = jnp.ones((DIM,), jnp.float32) * s
            # injected structural regression: extra dependent O(n²)
            # passes folded into ev0 (once per SOLVE, invisible at 1e-38)
            for _ in range(extra_passes):
                ev0 = ev0 + mv(H, ev0) * jnp.float32(1e-38)
            return solve_matvec_loop(
                H, lambda ev: mv(H, ev) / ev, EPS, MAX_ITR, ev0=ev0
            ).eigenvalue

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    return run


def _min_ms(fn, reps=7):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


def measure(H, extra_passes):
    long, short = chain(9, extra_passes), chain(1, extra_passes)
    float(np.asarray(long(H)))
    tl = _min_ms(lambda: float(np.asarray(long(H))))
    ts = _min_ms(lambda: float(np.asarray(short(H))))
    return (tl - ts) / 8


if __name__ == "__main__":
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    x = jnp.ones((DIM,), jnp.float32)

    def pass_step(i, s):
        Hi, xi = s
        return (Hi, mv(Hi, xi))

    pass_ms = time_marginal(pass_step, (H, x), k=64)
    bound = 18 * pass_ms * 1.10 + 0.25
    print(
        f"pass marginal: {pass_ms * 1e3:.0f} us -> relative bound {bound:.2f} ms",
        flush=True,
    )
    for name, extra in (("real", 0), ("injected(+2 passes/solve)", 2)):
        v = measure(H, extra)
        print(
            f"{name}: {v:.3f} ms/solve   fixed-8.0: "
            f"{'PASS' if v < 8.0 else 'FAIL'}   relative: "
            f"{'PASS' if v < bound else 'FAIL'}",
            flush=True,
        )
