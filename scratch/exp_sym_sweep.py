"""Variant sweep at 8192²: sym tile sizes × storage dtypes, interleaved
with the dense references in ONE process (chip-state drift visible).

Run (real TPU): timeout 2400 python scratch/exp_sym_sweep.py
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
        ("dense_f32", H, {}),
        ("sym512_f32", H, dict(symmetric=True, tile=512)),
        ("sym1024_f32", H, dict(symmetric=True, tile=1024)),
        ("sym256_f32", H, dict(symmetric=True, tile=256)),
        ("dense_bf16", Hb, dict(storage_dtype=jnp.bfloat16)),
        ("sym512_bf16", Hb, dict(symmetric=True, tile=512,
                                 storage_dtype=jnp.bfloat16)),
        ("sym1024_bf16", Hb, dict(symmetric=True, tile=1024,
                                  storage_dtype=jnp.bfloat16)),
        ("dense_f32_again", H, {}),
        ("sym512_f32_again", H, dict(symmetric=True, tile=512)),
    ]
    for name, A, kw in variants:
        t0 = time.time()
        r = solve_multiround(A, EPS, MAX_ITR, chunk=18, **kw)
        rounds, lam = int(r.rounds), float(r.eigenvalue)
        ms = time_marginal(mk_step(**kw), (A, jnp.ones((N,), jnp.float32)),
                           k=8, reps=5)
        frac = 1.0
        if kw.get("symmetric"):
            frac = 0.5 + 0.5 * kw["tile"] / N
        if kw.get("storage_dtype") is not None:
            frac *= 0.5
        gbs = 18 * N * N * 4 * frac / ms / 1e6
        print(f"{name:18s}: {ms:6.3f} ms/solve  rounds={rounds} "
              f"lam={lam:.6f}  ({gbs:5.0f} GB/s effective, "
              f"{time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
