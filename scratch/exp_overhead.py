"""Round-2 experiment: decompose the per-solve overhead of the matvec loop.

Chained differencing at several max_itr values fits per-solve time
= intercept + slope * max_itr for (a) the current production loop
(lax.cond skip inside the body) and (b) a restructured loop with the
stop check moved into the while-loop COND (no lax.cond, no where glue,
no done flag in the carry).  Also compares threading the chain
dependence through ev0 once per solve vs through every matvec call.

Run on the real TPU:  python scratch/exp_overhead.py
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
from eigen_value_tpu.ops.solver_matvec import solve_matvec_loop

DIM = 8192
CHAIN = 9
REPEATS = 7
BR = BC = 512


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


def matvec_of(H, s=None):
    def matvec(ev):
        evs = ev if s is None else ev * s
        y = kernels.matvec(H, evs, block_rows=BR, block_cols=BC)
        return y / evs

    return matvec


def solve_cur(H, s, max_itr):
    """Current production loop, dependence threaded through every matvec."""
    return solve_matvec_loop(H, matvec_of(H, s), EPS, max_itr).eigenvalue


def solve_nocond(H, s, max_itr):
    """Restructured: stop check in the while COND; body has no lax.cond.

    Exact-parity semantics (see solver_matvec.py docstrings):
      - converged at round k (k < max_itr): rounds=k, lam=v_k[0],
        ev updated with v_0..v_k
      - cap exhaustion: rounds=max_itr, converged=False, lam=v_{max-1}[0],
        ev updated with v_0..v_{max-1}
    """
    matvec = matvec_of(H)
    n = H.shape[0]
    ev0 = jnp.ones((n,), H.dtype) * s  # dependence folded into init, once
    v0 = matvec(ev0)

    def cond(c):
        ev, v, lam, i = c
        return (i < max_itr) & jnp.logical_not(stop_check(v, EPS))

    def body(c):
        ev, v, lam, i = c
        m = jnp.max(v)
        ev = ev * (v / m)
        lam = v[0]
        return (ev, matvec(ev), lam, i + 1)

    init = (ev0, v0, jnp.asarray(0.0, H.dtype), jnp.asarray(0, jnp.int32))
    ev, v, lam_prev, i = lax.while_loop(cond, body, init)
    converged = i < max_itr
    m = jnp.max(v)
    ev = jnp.where(converged, ev * (v / m), ev)
    lam = jnp.where(converged, v[0], lam_prev)
    return lam


def solve_cur_scaleonce(H, s, max_itr):
    """Current loop body, but dependence through ev0 (needs custom init)."""
    matvec = matvec_of(H)
    n = H.shape[0]
    ev0 = jnp.ones((n,), H.dtype) * s
    v0 = matvec(ev0)

    def cond(c):
        ev, v, lam, i, done = c
        return jnp.logical_not(done) & (i < max_itr)

    def body(c):
        ev, v, lam, i, done = c
        m = jnp.max(v)
        ev = ev * (v / m)
        done = stop_check(v, EPS)
        lam = v[0]
        v = lax.cond(done, lambda e: c[1], matvec, ev)
        i = jnp.where(done, i, i + 1)
        return (ev, v, lam, i, done)

    init = (ev0, v0, jnp.asarray(0.0, H.dtype), jnp.asarray(0, jnp.int32),
            jnp.asarray(False))
    out = lax.while_loop(cond, body, init)
    return out[2]


def chain(solve, k, max_itr):
    @jax.jit
    def run(H):
        def step(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
            return solve(H, s, max_itr)

        return lax.fori_loop(0, k, step, jnp.float32(0.0))

    return run


def measure(solve, name, max_itrs):
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    rows = []
    for mi in max_itrs:
        long, short = chain(solve, CHAIN, mi), chain(solve, 1, mi)
        lam = _sync(long(H))
        t_long = _min_ms(lambda: _sync(long(H)))
        t_short = _min_ms(lambda: _sync(short(H)))
        ms = (t_long - t_short) / (CHAIN - 1)
        rows.append((mi, ms))
        print(f"{name} max_itr={mi:3d}: {ms:7.3f} ms/solve  (lam={lam:.5f})",
              flush=True)
    if len(rows) >= 2:
        (x0, y0), (x1, y1) = rows[0], rows[-1]
        slope = (y1 - y0) / (x1 - x0)
        print(f"{name}: slope={slope*1e3:.1f} us/round  "
              f"intercept={y0 - slope*x0:.3f} ms", flush=True)


if __name__ == "__main__":
    mis = [1, 9, 17]
    measure(solve_cur, "cur          ", mis)
    measure(solve_cur_scaleonce, "cur+scaleonce", mis)
    measure(solve_nocond, "nocond       ", mis)
