"""Single-chip XLA solver tests: anchors, parity vs the parallel oracle,
eigen-pair property, cap semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigen_value_tpu import fixtures
from eigen_value_tpu.ops.solver import solve_xla
from eigen_value_tpu.reference_impl import parallel_oracle

EPS = 1e-3
MAX_ITR = 1000


def test_3x3_anchor():
    res = solve_xla(jnp.asarray(fixtures.ANCHOR_3X3, jnp.float32), EPS, MAX_ITR)
    assert bool(res.converged)
    assert abs(float(res.eigenvalue) - fixtures.ANCHOR_3X3_EIGENVALUE) < EPS
    for got, want in zip(np.asarray(res.eigenvector), fixtures.ANCHOR_3X3_EIGENVECTOR):
        assert abs(got - want) < EPS


@pytest.mark.parametrize("n", [128, 256, 512, 1024])
def test_hilbert_round_parity(n):
    res = solve_xla(fixtures.hilbert_matrix(n), EPS, MAX_ITR)
    assert bool(res.converged)
    assert int(res.rounds) == fixtures.HILBERT_ROUNDS[n]


@pytest.mark.parametrize("n", [128, 512])
def test_matches_parallel_oracle(n, rng):
    mat = rng.random((n, n), dtype=np.float32) + np.float32(1e-4)
    got = solve_xla(jnp.asarray(mat), EPS, MAX_ITR)
    want = parallel_oracle(mat)
    assert bool(got.converged) == want.converged
    assert int(got.rounds) == want.rounds
    assert abs(float(got.eigenvalue) - want.eigenvalue) < EPS
    np.testing.assert_allclose(
        np.asarray(got.eigenvector), want.eigenvector, atol=1e-4
    )


def test_eigen_pair_property(rng):
    # the wrapper test's Av = λv assertion (wrapper/python/test.py:15-16)
    mat = rng.random((1024, 1024), dtype=np.float32)
    res = solve_xla(jnp.asarray(mat), EPS, MAX_ITR)
    assert bool(res.converged)
    v = np.asarray(res.eigenvector)
    lam = float(res.eigenvalue)
    assert np.allclose(mat @ v, lam * v, atol=1e-3)


def test_already_converged_at_round_zero():
    mat = jnp.full((8, 8), 0.25, dtype=jnp.float32)
    res = solve_xla(mat, EPS, MAX_ITR)
    assert bool(res.converged) and int(res.rounds) == 0
    assert abs(float(res.eigenvalue) - 2.0) < EPS


def test_cap_exhaustion_semantics():
    # cap smaller than rounds-to-convergence: rounds == cap, converged False,
    # λ is the last checked v[0] (matches parallel_oracle)
    H = fixtures.hilbert_matrix(128)
    got = solve_xla(H, EPS, 3)
    want = parallel_oracle(np.asarray(H), max_itr=3)
    assert not bool(got.converged) and int(got.rounds) == 3
    assert abs(float(got.eigenvalue) - want.eigenvalue) < 1e-4


def test_eigenvector_max_component_is_one():
    # normalization is implicit: final ev has max element ~1 (SURVEY.md §0)
    res = solve_xla(fixtures.hilbert_matrix(256), EPS, MAX_ITR)
    assert abs(float(jnp.max(res.eigenvector)) - 1.0) < 1e-2


def test_f64_end_to_end(rng):
    """f64 solve under x64 mode (VERDICT r1 item 8): the config guard's
    happy path.  Rounds must match the f64 parallel oracle exactly; λ must
    agree with the reference's own f64 path (sequential main.py:63) and
    with numpy's eigensolver to stop-tolerance accuracy."""
    import jax

    from eigen_value_tpu import SolverConfig, max_eigenvalue
    from eigen_value_tpu.reference_impl import parallel_oracle, sequential_oracle

    mat = rng.random((96, 96)) + 0.1  # float64 numpy
    with jax.enable_x64():
        cfg = SolverConfig(dtype=jnp.float64)
        res = max_eigenvalue(jnp.asarray(mat), cfg)
        assert res.eigenvalue.dtype == jnp.float64
        assert bool(res.converged)

        want = parallel_oracle(mat, dtype=np.float64)
        assert int(res.rounds) == want.rounds
        assert float(res.eigenvalue) == pytest.approx(want.eigenvalue, rel=1e-12)

        seq = sequential_oracle(mat)
        assert float(res.eigenvalue) == pytest.approx(seq.eigenvalue, abs=2e-3)
        lam_np = np.max(np.real(np.linalg.eigvals(mat)))
        assert float(res.eigenvalue) == pytest.approx(lam_np, abs=2e-3)
