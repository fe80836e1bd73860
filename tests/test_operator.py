"""Matrix-free operator API (solve_operator / max_eigenvalue_operator)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eigen_value_tpu import fixtures, max_eigenvalue, max_eigenvalue_operator
from eigen_value_tpu.config import EPS, MAX_ITR
from eigen_value_tpu.ops.solver_matvec import solve_matvec, solve_operator


def test_dense_backed_operator_is_bitexact():
    """An operator wrapping a dense A@x must reproduce the dense matvec
    solver exactly (identical op sequence → identical f32 rounding)."""
    H = fixtures.hilbert_matrix(256)
    got = solve_operator(lambda x: H @ x, 256, EPS, MAX_ITR)
    want = solve_matvec(H, EPS, MAX_ITR)
    assert int(got.rounds) == int(want.rounds)
    assert float(got.eigenvalue) == float(want.eigenvalue)
    np.testing.assert_array_equal(
        np.asarray(got.eigenvector), np.asarray(want.eigenvector)
    )


def test_fft_hankel_operator_matches_dense():
    """The Hilbert matrix as an O(n)-memory FFT Hankel operator: λ within
    1e-4 relative of the dense solve, rounds within ±1 (FFT rounding
    differs from the dense reduction order), eigen-pair property holds."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from matrix_free import hankel_matvec

    n = 256
    h = 1.0 / jnp.arange(1, 2 * n, dtype=jnp.float32)
    mv = hankel_matvec(h, n)
    got = max_eigenvalue_operator(mv, n)
    want = max_eigenvalue(fixtures.hilbert_matrix(n))
    assert abs(int(got.rounds) - int(want.rounds)) <= 1
    assert float(got.eigenvalue) == pytest.approx(
        float(want.eigenvalue), rel=1e-4
    )
    H = np.asarray(fixtures.hilbert_matrix(n))
    v = np.asarray(got.eigenvector)
    assert np.allclose(H @ v, float(got.eigenvalue) * v, atol=1e-3)


def test_operator_is_jittable():
    n = 128
    H = fixtures.hilbert_matrix(n)
    f = jax.jit(lambda A: max_eigenvalue_operator(lambda x: A @ x, n))
    res = f(H)
    assert int(res.rounds) == fixtures.HILBERT_ROUNDS[n]
    assert bool(res.converged)


def test_operator_cap_exhaustion():
    H = fixtures.hilbert_matrix(128)
    res = solve_operator(lambda x: H @ x, 128, EPS, max_itr=2)
    assert not bool(res.converged) and int(res.rounds) == 2
