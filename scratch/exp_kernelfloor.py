"""Re-measure the raw matvec kernel marginal today, several ways, to pin
the true per-invocation floor (round-1 recorded 314 us; loop experiments
say ~358 us)."""

import jax
import jax.numpy as jnp

from eigen_value_tpu import fixtures
from eigen_value_tpu.ops.pallas import kernels
from eigen_value_tpu.utils.timing import time_marginal

DIM = 8192
eps32 = jnp.asarray(1e-38, jnp.float32)


def main():
    A = jax.block_until_ready(fixtures.hilbert_matrix(DIM))
    ones = jnp.ones((DIM,), jnp.float32)
    pk = dict(block_rows=512, block_cols=512)

    def matvec_pallas_step(i, s):
        Ai, xi = s
        return (Ai, kernels.matvec(Ai, xi, **pk) / xi)

    def matvec_pallas_nodiv(i, s):
        Ai, xi = s
        return (Ai, kernels.matvec(Ai, xi, **pk))

    def matvec_pallas_scalar_dep(i, s):
        # x numerically == ones every step; dependence via scalar only
        Ai, xi = s
        y = kernels.matvec(Ai, xi, **pk)
        return (Ai, ones + y[0] * eps32)

    def matvec_xla_step(i, s):
        Ai, xi = s
        return (Ai, (Ai @ xi) / xi)

    for k in (16, 64):
        for name, step in [
            ("pallas+div   ", matvec_pallas_step),
            ("pallas nodiv ", matvec_pallas_nodiv),
            ("pallas scalar", matvec_pallas_scalar_dep),
            ("xla+div      ", matvec_xla_step),
        ]:
            ms = time_marginal(step, (A, ones), k=k)
            print(f"k={k:3d} {name}: {ms*1e3:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
