"""End-to-end 8192² solve marginal: dense multiround vs SYMMETRIC
multiround (the round-4 headline candidate), interleaved in one process.

Prints rounds/λ parity and ms/solve marginals (chained ev0 threading,
launch latency cancels).  Run (real TPU):
    timeout 1800 python scratch/exp_sym_e2e.py [tile]
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


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    t0 = time.time()
    H = fixtures.hilbert_matrix(N)
    print(f"hilbert {time.time()-t0:.0f}s", flush=True)

    def mk_step(symmetric):
        # H rides the chain STATE: a closure capture would serialize the
        # 256 MB matrix into the remote-compile payload (HTTP 413)
        def step(i, s):
            A, ev = s
            sc = jnp.float32(1.0) + ev[0] * jnp.float32(1e-38)
            ev0 = jnp.ones((N,), jnp.float32) * sc
            kw = dict(symmetric=True, tile=tile) if symmetric else {}
            r = solve_multiround(A, EPS, MAX_ITR, chunk=18, ev0=ev0, **kw)
            return (A, r.eigenvector * r.eigenvalue)

        return step

    # correctness / parity first
    for name, sym in (("dense", False), ("sym", True)):
        kw = dict(symmetric=True, tile=tile) if sym else {}
        t0 = time.time()
        r = solve_multiround(H, EPS, MAX_ITR, chunk=18, **kw)
        print(
            f"{name}: rounds={int(r.rounds)} lam={float(r.eigenvalue):.6f} "
            f"converged={bool(r.converged)} (compile+run {time.time()-t0:.0f}s)",
            flush=True,
        )

    for name, sym in (("dense", False), ("sym", True), ("dense2", False),
                      ("sym2", True)):
        ms = time_marginal(mk_step(sym), (H, jnp.ones((N,), jnp.float32)),
                           k=8, reps=5)
        gbs = 18 * N * N * 4 * (0.5 + 0.5 * tile / N if sym else 1.0) / ms / 1e6
        print(f"{name}: {ms:.3f} ms/solve  ({gbs:5.0f} GB/s effective)",
              flush=True)


if __name__ == "__main__":
    main()
