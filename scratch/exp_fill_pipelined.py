"""Round-5c: cache-fill scheduling A/B at the headline config.  The
prologue fill serializes ~130 us of DMA before any round-0 compute (VPU
idle ~10% of the solve); the pipelined fill issues per-step and waits at
first use, riding the fill under round-0 compute.  Expected win ~0.05-
0.13 ms/solve.  Interleaved arms, one process.

Run (real TPU): timeout 2400 python scratch/exp_fill_pipelined.py
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
    H = fixtures.hilbert_matrix(N)
    Hb = H.astype(jnp.bfloat16)
    base = dict(symmetric=True, tile=512, cache_tiles=104)
    b16 = dict(symmetric=True, tile=512, cache_tiles=96,
               storage_dtype=jnp.bfloat16)
    variants = [
        ("prologue", H, dict(base)),
        ("pipelined", H, dict(base, fill_mode="pipelined")),
        ("prologue_b", H, dict(base)),
        ("pipelined_b", H, dict(base, fill_mode="pipelined")),
        ("bf16_prologue", Hb, dict(b16)),
        ("bf16_pipelined", Hb, dict(b16, fill_mode="pipelined")),
        ("prologue_c", H, dict(base)),
        ("pipelined_c", H, dict(base, fill_mode="pipelined")),
    ]
    for name, A, kw in variants:
        t0 = time.time()
        r = solve_multiround(A, EPS, MAX_ITR, chunk=18, **kw)
        ms = time_marginal(mk_step(**kw), (A, jnp.ones((N,), jnp.float32)),
                           k=8, reps=5)
        print(f"{name:14s}: {ms:6.3f} ms/solve  rounds={int(r.rounds)} "
              f"lam={float(r.eigenvalue):.6f}  ({time.time()-t0:.0f}s)",
              flush=True)

if __name__ == "__main__":
    main()
