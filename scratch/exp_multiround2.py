"""Decompose the in-loop vs standalone matvec gap, one process, fresh.

Arms (all chained like bench.py, dependence through one O(n) op/solve):
  prod      — production solve_matvec_pallas structure (full solve)
  pure18    — fori_loop of 18 dependent matvec kernel calls, minimal glue
              (y <- matvec(x)/x with x refreshed from y): the structural
              floor WITHOUT stop checks / while cond / finish epilogue
  kern18    — ONE multiround kernel invocation (init=True, chunk=18,
              budget=17): the solve minus the XLA chunk loop + epilogue
  vpu18     — full solve_multiround (kern18 + while cond + _finish)

pure18 vs prod  = cost of the solve structure (while cond, stop, finish)
kern18 vs pure18 = in-kernel round overhead vs free-running kernel calls
vpu18 vs kern18 = XLA wrapper cost of the chunked solve
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eigen_value_tpu import fixtures
from eigen_value_tpu.api import _resolve_blocks
from eigen_value_tpu.config import EPS, MAX_ITR, SolverConfig
from eigen_value_tpu.ops.pallas import kernels
from eigen_value_tpu.ops.solver_matvec import solve_matvec_loop, solve_multiround

DIM = 8192
CHAIN = 9
REPEATS = 9
BR, BC = _resolve_blocks(SolverConfig(), DIM)


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
    n = H.shape[0]
    ev0 = jnp.ones((n,), H.dtype) * s

    def matvec(ev):
        return kernels.matvec(H, ev, block_rows=BR, block_cols=BC) / ev

    return solve_matvec_loop(H, matvec, EPS, MAX_ITR, ev0=ev0).eigenvalue


def solve_pure18(H, s):
    n = H.shape[0]
    x0 = jnp.ones((n,), H.dtype) * s

    def body(i, x):
        y = kernels.matvec(H, x, block_rows=BR, block_cols=BC) / x
        return x * (y / jnp.max(y))  # the ev update, keeps magnitudes sane

    out = lax.fori_loop(0, 18, body, x0)
    return out[0]


def solve_kern18(H, s):
    n = H.shape[0]
    ev0 = jnp.ones((n,), H.dtype) * s
    ev, v, adv, lam = kernels.multiround(
        H, ev0, ev0, jnp.asarray(0.0, H.dtype), MAX_ITR,
        chunk=18, eps=EPS, init=True, block_rows=256, formulation="vpu",
    )
    return v[0] + ev[0] * jnp.float32(1e-30)


def solve_vpu18(H, s):
    n = H.shape[0]
    ev0 = jnp.ones((n,), H.dtype) * s
    return solve_multiround(
        H, EPS, MAX_ITR, chunk=18, block_rows=256, ev0=ev0
    ).eigenvalue


def chain(solve, k):
    @jax.jit
    def run(H):
        def step(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
            return solve(H, s)

        return lax.fori_loop(0, k, step, jnp.float32(0.0))

    return run


def measure(pair, name, H):
    long, short = pair
    val = _sync(long(H))
    t_long = _min_ms(lambda: _sync(long(H)))
    t_short = _min_ms(lambda: _sync(short(H)))
    ms = (t_long - t_short) / (CHAIN - 1)
    print(f"  {name}: {ms:7.3f} ms/solve  ({ms / 18 * 1e3:6.1f} us/pass)  val={val:.5f}", flush=True)
    return ms


if __name__ == "__main__":
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    arms = [
        ("prod  ", solve_prod),
        ("pure18", solve_pure18),
        ("kern18", solve_kern18),
        ("vpu18 ", solve_vpu18),
    ]
    pairs = {name: (chain(fn, CHAIN), chain(fn, 1)) for name, fn in arms}
    results = {name: [] for name, _ in arms}
    for cyc in range(cycles):
        print(f"cycle {cyc}:", flush=True)
        for name, _fn in arms:
            results[name].append(measure(pairs[name], name, H))
    for name, vals in results.items():
        print(f"{name}: min {min(vals):.3f}  all {[round(v, 3) for v in vals]}", flush=True)
