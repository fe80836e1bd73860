"""Round-5b: VMEM tile cache for NON-symmetric matrices (the tiled dense
kernel, direct terms only — solve_multiround(cache_tiles=C) without the
symmetric declaration).  At 8192² f32, C=104 leaves 152 MiB streaming
per round: expected ~0.62x of the dense stripes kernel's traffic.

Run (real TPU): timeout 2400 python scratch/exp_dense_cached.py
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
    variants = [
        ("stripes_C0", {}),
        ("tiled_C1", dict(cache_tiles=1, tile=512)),
        ("tiled_C64", dict(cache_tiles=64, tile=512)),
        ("tiled_C104", dict(cache_tiles=104, tile=512)),
        ("stripes_C0_again", {}),
        ("tiled_C104_again", dict(cache_tiles=104, tile=512)),
    ]
    for name, kw in variants:
        t0 = time.time()
        try:
            r = solve_multiround(H, EPS, MAX_ITR, chunk=18, **kw)
            rounds, lam = int(r.rounds), float(r.eigenvalue)
            ms = time_marginal(mk_step(**kw), (H, jnp.ones((N,), jnp.float32)),
                               k=8, reps=5)
        except Exception as e:
            print(f"{name:18s}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"{name:18s}: {ms:6.3f} ms/solve  rounds={rounds} "
              f"lam={lam:.6f}  ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
