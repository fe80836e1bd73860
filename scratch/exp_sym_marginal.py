"""Marginal timing of sym_matvec vs dense matvec at 8192^2 on the chip.

Usage: python scratch/exp_sym_marginal.py [tile ...]  (default 512)
Prints one line per variant; interleaves dense re-measurement around the
sym variants so chip-state drift is visible.
"""

import sys
import time

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from eigen_value_tpu import fixtures
from eigen_value_tpu.device import matvec_blocks
from eigen_value_tpu.ops.pallas import kernels
from eigen_value_tpu.utils.timing import time_marginal
from scratch.exp_sym_hw import sym_matvec

N = 8192


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [512]
    A = fixtures.hilbert_matrix(N)
    x = jnp.sum(A, axis=1)
    mb = matvec_blocks(N) or (512, 512)

    def dense_step(i, s):
        Ai, xi = s
        return (Ai, kernels.matvec(Ai, xi, block_rows=mb[0],
                                   block_cols=mb[1]) / xi)

    def report(name, ms, frac):
        gbs = N * N * 4 * frac / ms / 1e6
        print(f"{name}: {ms*1e3:7.1f} us/pass  ({gbs:5.0f} GB/s raw-dense-equiv "
              f"x{frac:.3f} traffic)", flush=True)

    t0 = time.time()
    ms_d = time_marginal(dense_step, (A, x), k=64, reps=5)
    report("dense", ms_d, 1.0)
    print(f"  (dense compile+measure {time.time()-t0:.0f}s)", flush=True)

    for form in ("vpu", "dot"):
        for tile in tiles:
            def sym_step(i, s, _t=tile, _f=form):
                Ai, xi = s
                return (Ai, sym_matvec(Ai, xi, tile=_t, form=_f) / xi)

            t0 = time.time()
            ms = time_marginal(sym_step, (A, x), k=64, reps=5)
            frac = 0.5 + 0.5 * tile / N
            report(f"sym_{form}_{tile}", ms, frac)
            print(f"  (compile+measure {time.time()-t0:.0f}s)", flush=True)

    ms_d2 = time_marginal(dense_step, (A, x), k=64, reps=5)
    report("dense_again", ms_d2, 1.0)


if __name__ == "__main__":
    main()
