"""A/B: production solve_matvec_pallas (full-row tiles) vs the round-3
multi-round kernel (solve_multiround: up to `chunk` rounds per Pallas
invocation).  Chained differencing exactly like bench.py; arms
interleaved in ONE process (chip-state lottery).  Run on a QUIET machine.

Usage: python scratch/exp_multiround.py [cycles]
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
BR, BC = _resolve_blocks(SolverConfig(), DIM)  # production full-row tiles


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


def make_multi(chunk, block_rows, formulation="vpu"):
    def solve_multi(H, s):
        n = H.shape[0]
        ev0 = jnp.ones((n,), H.dtype) * s
        return solve_multiround(
            H, EPS, MAX_ITR, chunk=chunk, block_rows=block_rows, ev0=ev0,
            formulation=formulation,
        ).eigenvalue

    return solve_multi


def chain(solve, k):
    @jax.jit
    def run(H):
        def step(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
            return solve(H, s)

        return lax.fori_loop(0, k, step, jnp.float32(0.0))

    return run


def parity_check():
    print("parity on silicon:", flush=True)
    for n in (1024, 4096, 8192):
        H = jax.block_until_ready(fixtures.hilbert_matrix(n))
        want = fixtures.HILBERT_ROUNDS[n]
        res = jax.jit(
            lambda A: solve_multiround(A, EPS, MAX_ITR, chunk=want + 1)
        )(H)
        lam = float(res.eigenvalue)
        print(
            f"  {n}: rounds {int(res.rounds)} (want {want}) "
            f"conv {bool(res.converged)} lam {lam:.6f}",
            flush=True,
        )


def measure(pair, name, H):
    long, short = pair
    lam = _sync(long(H))
    t_long = _min_ms(lambda: _sync(long(H)))
    t_short = _min_ms(lambda: _sync(short(H)))
    ms = (t_long - t_short) / (CHAIN - 1)
    print(f"  {name}: {ms:7.3f} ms/solve (lam={lam:.5f})", flush=True)
    return ms


if __name__ == "__main__":
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    # parity_check()  # done above
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    arms = [
        ("prod     ", solve_prod),
        ("vpu18x256", make_multi(18, 256, "vpu")),
        ("vpu18x512", make_multi(18, 512, "vpu")),
    ]
    pairs = {name: (chain(fn, CHAIN), chain(fn, 1)) for name, fn in arms}
    results = {name: [] for name, _ in arms}
    for cyc in range(cycles):
        print(f"cycle {cyc}:", flush=True)
        for name, _fn in arms:
            results[name].append(measure(pairs[name], name, H))
    for name, vals in results.items():
        print(
            f"{name}: min {min(vals):.3f}  all {[round(v, 3) for v in vals]}",
            flush=True,
        )
