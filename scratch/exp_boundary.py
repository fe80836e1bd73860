"""Round-5 boundary sweep (VERDICT r4 weak item 6): measure the three
backends at the dims BETWEEN the two previously-measured points (4096²
where the while-loop wins, 8192² where multiround wins) so
api.MULTIROUND_MIN_DIM rests on data instead of interpolation.

All three dims admit the 512 sym tile, so the sym rung is included —
if auto ever routes declared-symmetric inputs here, its boundary can
use the same data.

Run (real TPU): timeout 2400 python scratch/exp_boundary.py
"""

import sys
import time

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from eigen_value_tpu import fixtures
from eigen_value_tpu.config import EPS, MAX_ITR
from eigen_value_tpu.device import matvec_blocks
from eigen_value_tpu.ops.solver_matvec import (
    solve_matvec_pallas,
    solve_multiround,
)
from eigen_value_tpu.utils.timing import time_marginal

DIMS = [4096, 5120, 6144, 7168, 8192]


def run(n):
    H = fixtures.hilbert_matrix(n)
    rounds = fixtures.HILBERT_ROUNDS.get(n)
    chunk = (rounds or 17) + 1
    mb = matvec_blocks(n)
    variants = [
        ("matvec_pallas", lambda A, ev0: solve_matvec_pallas(
            A, EPS, MAX_ITR, block_rows=mb[0], block_cols=mb[1], ev0=ev0)),
        ("multiround", lambda A, ev0: solve_multiround(
            A, EPS, MAX_ITR, chunk=chunk, ev0=ev0)),
        ("multiround_sym", lambda A, ev0: solve_multiround(
            A, EPS, MAX_ITR, chunk=chunk, ev0=ev0, symmetric=True,
            tile=512)),
    ]
    for name, fn in variants:
        def step(i, s, _fn=fn, _n=n):
            A, ev = s
            sc = jnp.float32(1.0) + ev[0] * jnp.float32(1e-38)
            r = _fn(A, jnp.ones((_n,), jnp.float32) * sc)
            return (A, r.eigenvector * r.eigenvalue)

        t0 = time.time()
        r = fn(H, None)
        got = int(r.rounds)
        ms = time_marginal(step, (H, jnp.ones((n,), jnp.float32)), k=8,
                           reps=5)
        ok = "" if rounds is None or got == rounds else "  ROUNDS MISMATCH"
        print(f"n={n:5d} {name:14s}: {ms:7.3f} ms/solve  rounds={got}"
              f"  ({time.time()-t0:.0f}s){ok}", flush=True)


if __name__ == "__main__":
    for n in DIMS:
        run(n)
