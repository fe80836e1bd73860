"""Round-5 experiment: VMEM-resident cache levels for the symmetric
multiround kernel at 8192², interleaved with level-0 and dense references
in ONE process (chip-state drift visible between arms).

cache_tiles holds strictly-off-diagonal tiles VMEM-resident in a packed
cache, their matvec work SPREAD across the streamed grid steps so it
hides under the stream DMAs (kernels.sym_cache_split; the concentrated-
prologue variant measured SLOWER than streaming: 4.6 vs 3.5 ms — the
pipeline prefetches only one block ahead, so a long t==0 compute
serializes with all later DMAs):
  tiles=0:  stream 136 tiles/round            (frac 0.531 of dense)
  tiles=64: cache 64 MiB, stream 72 MiB/rd    (frac ~0.30 over 18 passes)
  tiles=96: cache 96 MiB, stream 40 MiB/rd    (frac ~0.18 over 18 passes)
bf16 composes with tile=1024 (2 MiB tiles): tiles=24 caches 48 MiB of
the 36-tile triangle, streaming 24 MiB/round.

Run (real TPU): timeout 2400 python scratch/exp_sym_cached.py
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


def frac_of(kw, rounds=17):
    """Per-solve HBM traffic as a fraction of the dense-f32 18-pass
    stream: streamed tiles every pass + cached tiles once."""
    from eigen_value_tpu.ops.pallas.kernels import sym_cache_split, sym_tile

    passes = rounds + 1
    if not kw.get("symmetric"):
        f = 1.0
    else:
        bt = sym_tile(N, kw.get("tile", 512))
        streamed, cached = sym_cache_split(N, bt, kw.get("cache_tiles", 0))
        f = (passes * len(streamed) + len(cached)) * bt * bt / (passes * N * N)
    if kw.get("storage_dtype") is not None:
        f *= 0.5
    return f


def main():
    H = fixtures.hilbert_matrix(N)
    Hb = H.astype(jnp.bfloat16)

    variants = [
        ("dense_f32", H, {}),
        ("sym512_C0", H, dict(symmetric=True, tile=512)),
        ("sym512_C48", H, dict(symmetric=True, tile=512, cache_tiles=48)),
        ("sym512_C64", H, dict(symmetric=True, tile=512, cache_tiles=64)),
        ("sym512_C96", H, dict(symmetric=True, tile=512, cache_tiles=96)),
        ("sym512_C104", H, dict(symmetric=True, tile=512, cache_tiles=104)),
        ("bf16_C0", Hb, dict(symmetric=True, tile=1024,
                             storage_dtype=jnp.bfloat16)),
        ("bf16_C24", Hb, dict(symmetric=True, tile=1024,
                              storage_dtype=jnp.bfloat16, cache_tiles=24)),
        ("bf16s512_C96", Hb, dict(symmetric=True, tile=512,
                                  storage_dtype=jnp.bfloat16,
                                  cache_tiles=96)),
        ("sym512_C0_again", H, dict(symmetric=True, tile=512)),
        ("sym512_C96_again", H, dict(symmetric=True, tile=512,
                                     cache_tiles=96)),
    ]
    for name, A, kw in variants:
        t0 = time.time()
        try:
            r = solve_multiround(A, EPS, MAX_ITR, chunk=18, **kw)
            rounds, lam = int(r.rounds), float(r.eigenvalue)
            ms = time_marginal(mk_step(**kw), (A, jnp.ones((N,), jnp.float32)),
                               k=8, reps=5)
        except Exception as e:
            print(f"{name:18s}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        f = frac_of(kw, rounds)
        gbs = (rounds + 1) * N * N * 4 * f / ms / 1e6
        print(f"{name:18s}: {ms:6.3f} ms/solve  rounds={rounds} "
              f"lam={lam:.6f}  frac={f:.3f}  ({gbs:5.0f} GB/s effective, "
              f"{time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
