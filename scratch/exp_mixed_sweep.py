"""Round-5c: sweep the MXU share (mxu_tiles) of the mixed formulation at
the headline config (8192^2 f32, tile=512, C=104).  Balance model says
m* ~ 28 (total 256 terms, MXU 3.5x/term); if VPU/MXU issue overlaps, the
win is up to ~22% of the compute wall.  vpu baselines interleaved
(chip-state drift visible).

Run (real TPU): timeout 2400 python scratch/exp_mixed_sweep.py
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
    base = dict(symmetric=True, tile=512, cache_tiles=104)
    variants = [("vpu", dict(base))]
    for m in (16, 28, 40, 52):
        variants.append((f"mixed_m{m}", dict(base, formulation="mixed",
                                             mxu_tiles=m)))
    variants.append(("vpu_b", dict(base)))
    variants.append(("mixed_auto", dict(base, formulation="mixed")))
    for name, kw in variants:
        t0 = time.time()
        r = solve_multiround(H, EPS, MAX_ITR, chunk=18, **kw)
        ms = time_marginal(mk_step(**kw), (H, jnp.ones((N,), jnp.float32)),
                           k=8, reps=5)
        print(f"{name:12s}: {ms:6.3f} ms/solve  rounds={int(r.rounds)} "
              f"lam={float(r.eigenvalue):.6f}  ({time.time()-t0:.0f}s)",
              flush=True)

if __name__ == "__main__":
    main()
