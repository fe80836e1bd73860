"""Pallas kernel tests — interpret mode on CPU (the sanitizer pass,
SURVEY.md §5); exact agreement with the jnp passes and full-solve parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigen_value_tpu import fixtures
from eigen_value_tpu.ops.pallas import kernels
from eigen_value_tpu.ops.solver import solve_xla
from eigen_value_tpu.ops.solver_pallas import solve_pallas

EPS = 1e-3
MAX_ITR = 1000
KW = dict(block_rows=128, block_cols=128, interpret=True)


class TestRowsum:
    def test_identity(self):
        # reference analog: row sums of identity are exactly 1 (tests/test.cpp:22-30)
        v = kernels.rowsum(fixtures.identity_matrix(256), **KW)
        assert (np.asarray(v) == 1.0).all()

    @pytest.mark.parametrize("n", [128, 512])
    def test_matches_jnp(self, n, rng):
        A = jnp.asarray(rng.random((n, n), dtype=np.float32))
        got = np.asarray(kernels.rowsum(A, **KW))
        want = np.asarray(jnp.sum(A, axis=1))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_multi_column_block_accumulation(self, rng):
        # n > block_cols exercises the revisited-accumulator path
        A = jnp.asarray(rng.random((512, 512), dtype=np.float32))
        got = np.asarray(kernels.rowsum(A, block_rows=128, block_cols=128, interpret=True))
        np.testing.assert_allclose(got, np.asarray(A).sum(axis=1), rtol=1e-6)


class TestScale:
    @pytest.mark.parametrize("n", [128, 256])
    def test_matches_jnp(self, n, rng):
        A = jnp.asarray(rng.random((n, n), dtype=np.float32) + 0.1)
        v = jnp.asarray(rng.random(n, dtype=np.float32) + 0.5)
        got = np.asarray(kernels.scale(A, v, **KW))
        one = np.float32(1.0)
        want = np.asarray(A) * ((one / np.asarray(v))[:, None] * np.asarray(v)[None, :])
        np.testing.assert_array_equal(got, want)


class TestScaleRowsum:
    @pytest.mark.parametrize("n", [128, 512])
    def test_matches_separate_passes(self, n, rng):
        A = jnp.asarray(rng.random((n, n), dtype=np.float32) + 0.1)
        v = jnp.asarray(rng.random(n, dtype=np.float32) + 0.5)
        A2, v2 = kernels.scale_rowsum(A, v, **KW)
        A2_want = kernels.scale(A, v, **KW)
        v2_want = kernels.rowsum(A2_want, **KW)
        np.testing.assert_array_equal(np.asarray(A2), np.asarray(A2_want))
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(v2_want))


class TestStopKernel:
    def test_reference_fixtures(self):
        # the reference's stop success/fail fixture pair (tests/test.cpp:56-73)
        ok = kernels.stop(
            fixtures.stop_success_vector(4096), 1e-3, lanes=256, block_rows=8, interpret=True
        )
        bad = kernels.stop(
            fixtures.stop_fail_vector(4096), 1e-3, lanes=256, block_rows=8, interpret=True
        )
        assert bool(ok) and not bool(bad)

    @pytest.mark.parametrize("idx", [0, 255, 256, 4095, 2048 + 7])
    def test_single_break_detected(self, idx):
        v = np.full(4096, 1.0, np.float32)
        v[idx] = 2.0
        got = kernels.stop(jnp.asarray(v), 1e-3, lanes=256, block_rows=8, interpret=True)
        assert not bool(got)

    def test_rows_not_divisible_by_block_rows(self):
        # rows = n/lanes = 12 is not divisible by block_rows=8; the kernel
        # must shrink the block to a divisor (6) instead of asserting
        from eigen_value_tpu.ops.solver import stop_check

        v = fixtures.stop_fail_vector(12 * 256)
        got = kernels.stop(v, 1e-3, lanes=256, block_rows=8, interpret=True)
        assert bool(got) == bool(stop_check(v, 1e-3))
        ok = kernels.stop(
            fixtures.stop_success_vector(12 * 256),
            1e-3,
            lanes=256,
            block_rows=8,
            interpret=True,
        )
        assert bool(ok)

    def test_fuzz_matches_stop_check(self, rng):
        from eigen_value_tpu.ops.solver import stop_check

        for i in range(10):
            v = jnp.asarray(rng.random(2048, dtype=np.float32) * (0.2 if i % 2 else 1.0))
            got = kernels.stop(v, 0.5, lanes=256, block_rows=4, interpret=True)
            assert bool(got) == bool(stop_check(v, 0.5))


class TestSolvePallas:
    @pytest.mark.parametrize("n", [128, 256, 512])
    def test_hilbert_round_parity(self, n):
        res = solve_pallas(fixtures.hilbert_matrix(n), EPS, MAX_ITR, 128, 128, True)
        assert bool(res.converged)
        assert int(res.rounds) == fixtures.HILBERT_ROUNDS[n]

    def test_matches_xla_solver(self, rng):
        mat = jnp.asarray(rng.random((256, 256), dtype=np.float32) + 1e-4)
        got = solve_pallas(mat, EPS, MAX_ITR, 128, 128, True)
        want = solve_xla(mat, EPS, MAX_ITR)
        assert int(got.rounds) == int(want.rounds)
        assert abs(float(got.eigenvalue) - float(want.eigenvalue)) < 1e-5
        np.testing.assert_allclose(
            np.asarray(got.eigenvector), np.asarray(want.eigenvector), atol=1e-5
        )

    def test_eigen_pair_property(self, rng):
        mat = rng.random((256, 256), dtype=np.float32)
        res = solve_pallas(jnp.asarray(mat), EPS, MAX_ITR, 128, 128, True)
        v = np.asarray(res.eigenvector)
        assert np.allclose(mat @ v, float(res.eigenvalue) * v, atol=1e-3)
