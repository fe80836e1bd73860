"""Round-5c experiment: matvec FORMULATION in the compute-bound cached
regime — "vpu" (broadcast-multiply + reduce) vs "dot" (MXU dot_general).

Rationale: the round-3 A/B found both formulations identical on silicon,
but that was the HBM-bound regime (DMA hides all compute).  The round-5
VMEM-resident cache made the solve ~VPU-compute-bound (~57 µs/round of
arithmetic vs ~47 µs/round of stream DMA at C=104), so the formulation
now sits on the critical path.  The MXU is otherwise IDLE during the
solve; if dot_general's M=1 vector-matrix form is at all competitive,
routing part (or all) of the matvec there could cut the compute wall.
Counter-hypothesis: M=1 wastes 7/8 of the MXU's sublanes and HIGHEST
precision triples f32 passes, so dot may lose badly — measure, don't
guess.

Run (real TPU): timeout 2400 python scratch/exp_mxu_cached.py
"""

import sys
import time

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

    variants = [
        ("vpu_C104", H, dict(symmetric=True, tile=512, cache_tiles=104)),
        ("dot_C104", H, dict(symmetric=True, tile=512, cache_tiles=104,
                             formulation="dot")),
        ("vpu_C0", H, dict(symmetric=True, tile=512)),
        ("dot_C0", H, dict(symmetric=True, tile=512, formulation="dot")),
        ("bf16_vpu_C96", Hb, dict(symmetric=True, tile=512,
                                  storage_dtype=jnp.bfloat16,
                                  cache_tiles=96)),
        ("bf16_dot_C96", Hb, dict(symmetric=True, tile=512,
                                  storage_dtype=jnp.bfloat16,
                                  cache_tiles=96, formulation="dot")),
        ("vpu_C104_again", H, dict(symmetric=True, tile=512,
                                   cache_tiles=104)),
        ("dot_C104_again", H, dict(symmetric=True, tile=512, cache_tiles=104,
                                   formulation="dot")),
    ]
    for name, A, kw in variants:
        t0 = time.time()
        try:
            r = solve_multiround(A, EPS, MAX_ITR, chunk=18, **kw)
            rounds, lam = int(r.rounds), float(r.eigenvalue)
            ms = time_marginal(mk_step(**kw), (A, jnp.ones((N,), jnp.float32)),
                               k=8, reps=5)
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"{name:16s}: {ms:6.3f} ms/solve  rounds={rounds} "
              f"lam={lam:.6f}  ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
