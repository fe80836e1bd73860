"""Refine full-row block sweep; then full-solve A/B (production loop vs
stop-in-cond vs fused kernel) at the best shape."""

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


def chain(solve, k):
    @jax.jit
    def run(H):
        def step(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
            return solve(H, s)

        return lax.fori_loop(0, k, step, jnp.float32(0.0))

    return run


def measure(solve, name, per=ROUNDS):
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    long, short = chain(solve, CHAIN), chain(solve, 1)
    try:
        _sync(long(H))
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:90]}", flush=True)
        return
    t_long = _min_ms(lambda: _sync(long(H)))
    t_short = _min_ms(lambda: _sync(short(H)))
    ms = (t_long - t_short) / (CHAIN - 1)
    print(f"{name}: {ms:7.3f} ms ({ms/per*1e3:6.1f} us/pass)", flush=True)


def pure(br, bc):
    def solve(H, s):
        x0 = jnp.ones((DIM,), H.dtype) * s

        def body(i, x):
            return kernels.matvec(H, x, block_rows=br, block_cols=bc)

        return lax.fori_loop(0, ROUNDS, body, x0)[0]

    return solve


KW = dict(block_rows=64, block_cols=8192)


def solve_prod(H, s):
    def matvec(ev):
        evs = ev * s
        return kernels.matvec(H, evs, **KW) / evs

    return solve_matvec_loop(H, matvec, EPS, MAX_ITR).eigenvalue


def solve_nocond(H, s):
    def matvec(ev):
        return kernels.matvec(H, ev, **KW) / ev

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


def solve_fused(H, s):
    n = H.shape[0]
    ev0 = jnp.ones((n,), H.dtype) * s
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

    init = (ev0, v0, jnp.asarray(0.0, H.dtype), jnp.asarray(0, jnp.int32))
    ev, v, lam_prev, i = lax.while_loop(cond, body, init)
    return jnp.where(i < MAX_ITR, v[0], lam_prev)


if __name__ == "__main__":
    for br in (16, 32, 64, 128):
        measure(pure(br, 8192), f"pure {br:4d}x8192")
    measure(solve_prod, "solve prod   64x8192", per=18)
    measure(solve_nocond, "solve nocond 64x8192", per=18)
    measure(solve_fused, "solve fused  64x8192", per=18)
