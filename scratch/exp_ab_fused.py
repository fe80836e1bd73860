"""A/B: production solve_matvec_pallas vs the round-2 fused+glueless
structure, chained differencing exactly like bench.py.  Dependence enters
through ev0 (scale-invariant).  Run on a QUIET machine.
"""

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
CHAIN = 9
REPEATS = 9
KW = dict(block_rows=512, block_cols=512)


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


def solve_prod(H, s):
    """Current production structure, dependence through every matvec
    (identical to bench.py's chain body)."""

    def matvec(ev):
        evs = ev * s
        return kernels.matvec(H, evs, **KW) / evs

    return solve_matvec_loop(H, matvec, EPS, MAX_ITR).eigenvalue


def solve_fused(H, s):
    """solve_matvec_pallas_fused structure with ev0 = ones*s."""
    n = H.shape[0]
    dtype = H.dtype
    ev0 = jnp.ones((n,), dtype) * s
    v0 = kernels.matvec(H, ev0, **KW) / ev0

    def cond(c):
        ev, v, lam, i = c
        return (i < MAX_ITR) & jnp.logical_not(stop_check(v, EPS))

    def body(c):
        ev, v, lam, i = c
        m = jnp.max(v)
        lam = v[0]
        v_next, ev_new = kernels.round_matvec(H, ev, v, m, **KW)
        return (ev_new, v_next, lam, i + 1)

    init = (ev0, v0, jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32))
    ev, v, lam_prev, i = lax.while_loop(cond, body, init)
    converged = i < MAX_ITR
    lam = jnp.where(converged, v[0], lam_prev)
    return lam


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
    lam = _sync(long(H))
    t_long = _min_ms(lambda: _sync(long(H)))
    t_short = _min_ms(lambda: _sync(short(H)))
    ms = (t_long - t_short) / (CHAIN - 1)
    print(f"{name}: {ms:7.3f} ms/solve (lam={lam:.5f})", flush=True)
    return ms


if __name__ == "__main__":
    for rep in range(3):
        a = measure(solve_prod, "prod ")
        b = measure(solve_fused, "fused")
        print(f"  delta: {a-b:+.3f} ms", flush=True)
