"""Differentiable maximum eigenvalue (custom VJP).

The solver's `lax.while_loop` is not reverse-mode differentiable, but the
Perron eigenvalue has a closed-form adjoint: with right eigenvector v
(A v = λ v) and left eigenvector u (Aᵀ u = λ u),

    ∂λ/∂A = u vᵀ / (uᵀ v)

(normalization-invariant).  Forward runs the production matvec solver; the
backward pass solves once more on Aᵀ — which is positive iff A is, so the
same method applies.  This is a capability the reference does not have at
all; it falls out of the TPU-first functional design.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import EPS, MAX_ITR
from .solver_matvec import solve_matvec


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def eigenvalue(A: jax.Array, eps: float = EPS, max_itr: int = MAX_ITR) -> jax.Array:
    """Maximum eigenvalue of a positive square matrix, differentiable in A."""
    return solve_matvec(A, eps, max_itr).eigenvalue


def _fwd(A, eps, max_itr):
    res = solve_matvec(A, eps, max_itr)
    return res.eigenvalue, (A, res.eigenvector)


def _bwd(eps, max_itr, residuals, lam_bar):
    A, v = residuals
    u = solve_matvec(A.T, eps, max_itr).eigenvector  # left eigenvector of A
    denom = jnp.dot(u, v)
    dA = lam_bar * (u[:, None] * v[None, :]) / denom
    return (dA,)


eigenvalue.defvjp(_fwd, _bwd)
