"""Differentiable eigenpair: gradient-based spectral design.

Uses the framework's custom VJPs (ops/autodiff.py) to tune a matrix so its
Perron eigenvalue hits a target — a capability with no analog in the
reference, falling out of the TPU-first functional design.

Run: python examples/autodiff.py
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from eigen_value_tpu.ops.autodiff import eigenpair, eigenvalue


def main() -> None:
    rng = np.random.default_rng(0)
    A0 = jnp.asarray(rng.random((64, 64), dtype=np.float32) + 0.1)
    target = 40.0

    # Gradient descent on log-entries (keeps A positive) toward target λ.
    def loss(logA):
        lam = eigenvalue(jnp.exp(logA))
        return (lam - target) ** 2

    logA = jnp.log(A0)
    grad = jax.jit(jax.grad(loss))
    lam0 = float(eigenvalue(A0))
    for step in range(60):
        logA = logA - 0.5 * grad(logA)
    lam1 = float(eigenvalue(jnp.exp(logA)))
    print(f"λ: {lam0:.3f} → {lam1:.3f} (target {target})")
    assert abs(lam1 - target) < 0.5

    # Eigenvector sensitivities via the full eigenpair VJP: how does each
    # matrix entry move component 0 of the Perron vector?
    (lam, v), vjp_fn = jax.vjp(lambda M: eigenpair(M), A0)
    cot = jnp.zeros_like(v).at[0].set(1.0)
    (dA,) = vjp_fn((jnp.zeros(()), cot))
    print(
        f"∂v[0]/∂A: max |sensitivity| {float(jnp.abs(dA).max()):.2e} "
        f"at entry {tuple(int(i) for i in jnp.unravel_index(jnp.argmax(jnp.abs(dA)), dA.shape))}"
    )


if __name__ == "__main__":
    main()
