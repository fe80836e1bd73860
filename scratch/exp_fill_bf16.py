"""bf16-focused fill A/B (6 alternations): exp_fill_pipelined's single
bf16 pair read pipelined 0.881 vs prologue 1.026 — drift or real?
(Theory says LESS benefit for bf16: the fill is only 48 MiB.)

Run (real TPU): timeout 2400 python scratch/exp_fill_bf16.py
"""
import sys, time
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from eigen_value_tpu import fixtures
from eigen_value_tpu.config import EPS, MAX_ITR
from eigen_value_tpu.ops.solver_matvec import solve_multiround
from eigen_value_tpu.utils.timing import time_marginal

N = 8192

def mk_step(**kw):
    def step(i, s):
        A, ev = s
        sc = jnp.float32(1.0) + ev[0] * jnp.float32(1e-38)
        ev0 = jnp.ones((N,), jnp.float32) * sc
        r = solve_multiround(A, EPS, MAX_ITR, chunk=18, ev0=ev0, **kw)
        return (A, r.eigenvector * r.eigenvalue)
    return step

def main():
    Hb = fixtures.hilbert_matrix(N).astype(jnp.bfloat16)
    base = dict(symmetric=True, tile=512, cache_tiles=96,
                storage_dtype=jnp.bfloat16)
    arms = {
        "prologue": dict(base),
        "pipelined": dict(base, fill_mode="pipelined"),
    }
    for kw in arms.values():
        solve_multiround(Hb, EPS, MAX_ITR, chunk=18, **kw)
    wins = 0
    for it in range(6):
        row = {}
        for name, kw in arms.items():
            row[name] = time_marginal(
                mk_step(**kw), (Hb, jnp.ones((N,), jnp.float32)), k=8,
                reps=3)
        d = row["prologue"] - row["pipelined"]
        wins += d > 0
        print(f"iter {it}: prologue {row['prologue']:.3f}  "
              f"pipelined {row['pipelined']:.3f}  delta {d:+.3f} ms",
              flush=True)
    print(f"pipelined wins {wins}/6", flush=True)

if __name__ == "__main__":
    main()
