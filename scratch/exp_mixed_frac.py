"""Round-5c follow-up: the "mixed" formulation (streamed VPU + cached
MXU) as-is, to measure whether Mosaic overlaps VPU and MXU issue at all.
Pure-dot measured 4.2 ms vs vpu 1.14-1.36 (exp_mxu_cached) -> the MXU
matvec is ~3.5x slower per unit work, so all-104-tiles-on-MXU should
lose; the question is whether mixed reads as max(streams, mxu) [overlap]
or sum [no overlap], which decides if a FRACTIONAL offload knob is worth
building.

Run (real TPU): timeout 2400 python scratch/exp_mixed_frac.py
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
    variants = [
        ("vpu_C104", dict(symmetric=True, tile=512, cache_tiles=104)),
        ("mixed_C104", dict(symmetric=True, tile=512, cache_tiles=104,
                            formulation="mixed")),
        ("vpu_C104_b", dict(symmetric=True, tile=512, cache_tiles=104)),
    ]
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
