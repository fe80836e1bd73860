"""Multi-device tests on the virtual 8-device CPU mesh.

These are the tests the reference couldn't have (SURVEY.md §4e): the sharded
solver must agree with the single-device path to tolerance, with identical
round counts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from eigen_value_tpu import fixtures
from eigen_value_tpu.ops.solver import solve_xla
from eigen_value_tpu.parallel import (
    make_row_mesh,
    solve_batched,
    solve_batched_rowsharded,
    solve_batched_sharded,
    solve_sharded,
    solve_sharded_matvec,
    solve_sharded_matvec_ring,
)
from eigen_value_tpu.parallel.multihost import (
    elems_per_second,
    weak_scaling_efficiency,
)

EPS = 1e-3
MAX_ITR = 1000


def cpu_mesh(n, axis="rows"):
    return Mesh(np.array(jax.devices("cpu")[:n]), (axis,))


class TestSharded:
    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_matches_single_device(self, n_dev):
        H = fixtures.hilbert_matrix(256)
        want = solve_xla(H, EPS, MAX_ITR)
        got = solve_sharded(H, cpu_mesh(n_dev))
        assert int(got.rounds) == int(want.rounds) == fixtures.HILBERT_ROUNDS[256]
        assert bool(got.converged)
        assert abs(float(got.eigenvalue) - float(want.eigenvalue)) < 1e-5
        np.testing.assert_allclose(
            np.asarray(got.eigenvector), np.asarray(want.eigenvector), atol=1e-5
        )

    def test_random_positive(self, rng):
        mat = jnp.asarray(rng.random((128, 128), dtype=np.float32) + 1e-4)
        got = solve_sharded(mat, cpu_mesh(4))
        v = np.asarray(got.eigenvector)
        lam = float(got.eigenvalue)
        assert bool(got.converged)
        assert np.allclose(np.asarray(mat) @ v, lam * v, atol=1e-3)

    def test_indivisible_dim_raises(self):
        with pytest.raises(ValueError):
            solve_sharded(fixtures.hilbert_matrix(130), cpu_mesh(4))

    def test_make_row_mesh(self):
        mesh = make_row_mesh(4)
        assert mesh.shape["rows"] == 4

    def test_make_row_mesh_too_few_devices_raises(self):
        with pytest.raises(ValueError, match="only"):
            make_row_mesh(4096)

    def test_sharded_pallas_matvec_nonpow2_blocks(self):
        """use_pallas with a 768-row shard (not divisible by the 512
        default block) must adapt the tile shape; runs interpreted on the
        CPU mesh."""
        H = fixtures.hilbert_matrix(768)
        want = solve_xla(H, EPS, MAX_ITR)
        got = solve_sharded_matvec(H, cpu_mesh(2), use_pallas=True)
        assert int(got.rounds) == int(want.rounds)
        assert bool(got.converged)
        assert abs(float(got.eigenvalue) - float(want.eigenvalue)) < 1e-3


class TestShardedMatvec:
    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_matches_single_device(self, n_dev):
        H = fixtures.hilbert_matrix(256)
        want = solve_xla(H, EPS, MAX_ITR)
        got = solve_sharded_matvec(H, cpu_mesh(n_dev))
        assert int(got.rounds) == int(want.rounds) == fixtures.HILBERT_ROUNDS[256]
        assert bool(got.converged)
        assert abs(float(got.eigenvalue) - float(want.eigenvalue)) < 1e-5
        np.testing.assert_allclose(
            np.asarray(got.eigenvector), np.asarray(want.eigenvector), atol=1e-5
        )

    def test_eigen_pair_property(self, rng):
        mat = jnp.asarray(rng.random((128, 128), dtype=np.float32) + 1e-4)
        got = solve_sharded_matvec(mat, cpu_mesh(4))
        v = np.asarray(got.eigenvector)
        lam = float(got.eigenvalue)
        assert bool(got.converged)
        assert np.allclose(np.asarray(mat) @ v, lam * v, atol=1e-3)


class TestShardedRing:
    """Ring-pipelined sharded solver: no all_gather, ppermute chunk
    rotation overlapped with the chunk GEMVs."""

    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_matches_single_device(self, n_dev):
        H = fixtures.hilbert_matrix(256)
        want = solve_xla(H, EPS, MAX_ITR)
        got = solve_sharded_matvec_ring(H, cpu_mesh(n_dev))
        assert int(got.rounds) == int(want.rounds) == fixtures.HILBERT_ROUNDS[256]
        assert bool(got.converged)
        assert abs(float(got.eigenvalue) - float(want.eigenvalue)) < 1e-4
        np.testing.assert_allclose(
            np.asarray(got.eigenvector), np.asarray(want.eigenvector), atol=1e-4
        )

    def test_round_parity_across_mesh_sizes(self):
        """The source-order partial accumulation makes the reduction order
        P-invariant: round counts must be identical at every mesh size."""
        H = fixtures.hilbert_matrix(512)
        rounds = {
            n_dev: int(solve_sharded_matvec_ring(H, cpu_mesh(n_dev)).rounds)
            for n_dev in (1, 2, 8)
        }
        assert len(set(rounds.values())) == 1, rounds

    def test_random_positive(self, rng):
        mat = jnp.asarray(rng.random((128, 128), dtype=np.float32) + 1e-4)
        got = solve_sharded_matvec_ring(mat, cpu_mesh(4))
        v = np.asarray(got.eigenvector)
        lam = float(got.eigenvalue)
        assert bool(got.converged)
        assert np.allclose(np.asarray(mat) @ v, lam * v, atol=1e-3)

    def test_agrees_with_gathered_form(self):
        H = fixtures.hilbert_matrix(256)
        a = solve_sharded_matvec(H, cpu_mesh(4))
        b = solve_sharded_matvec_ring(H, cpu_mesh(4))
        assert int(a.rounds) == int(b.rounds)
        assert abs(float(a.eigenvalue) - float(b.eigenvalue)) < 1e-4


class TestBatched:
    def test_per_matrix_round_counts(self, rng):
        # batch mixing dims of different convergence speed: per-matrix rounds
        # must match per-matrix single solves (masked-freeze semantics)
        mats = np.stack(
            [rng.random((128, 128), dtype=np.float32) + 1e-4 for _ in range(4)]
        )
        got = solve_batched(jnp.asarray(mats), EPS, MAX_ITR)
        for b in range(4):
            want = solve_xla(jnp.asarray(mats[b]), EPS, MAX_ITR)
            assert int(got.rounds[b]) == int(want.rounds)
            assert abs(float(got.eigenvalue[b]) - float(want.eigenvalue)) < 1e-5
            np.testing.assert_allclose(
                np.asarray(got.eigenvector[b]),
                np.asarray(want.eigenvector),
                atol=1e-5,
            )

    def test_batched_hilbert_converges(self):
        As = jnp.stack([fixtures.hilbert_matrix(128)] * 3)
        res = solve_batched(As, EPS, MAX_ITR)
        assert np.asarray(res.converged).all()
        assert (np.asarray(res.rounds) == fixtures.HILBERT_ROUNDS[128]).all()

    def test_batched_rowsharded_2d_mesh(self, rng):
        # DP x TP composition on a 2x4 mesh: per-matrix results must match
        # the plain batched solver
        mats = jnp.asarray(
            np.stack([rng.random((128, 128), dtype=np.float32) + 1e-4 for _ in range(4)])
        )
        mesh = Mesh(
            np.array(jax.devices("cpu")[:8]).reshape(2, 4), ("batch", "rows")
        )
        got = solve_batched_rowsharded(mats, mesh)
        want = solve_batched(mats, EPS, MAX_ITR)
        np.testing.assert_array_equal(np.asarray(got.rounds), np.asarray(want.rounds))
        np.testing.assert_allclose(
            np.asarray(got.eigenvalue), np.asarray(want.eigenvalue), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.eigenvector), np.asarray(want.eigenvector), atol=1e-5
        )

    @pytest.mark.slow
    def test_config4_full_scale(self, rng):
        """BASELINE.json config 4 at its stated scale: 256 independent 512²
        positive matrices, batch axis sharded across the 8-device mesh."""
        mats = jnp.asarray(rng.random((256, 512, 512), dtype=np.float32) + 1e-4)
        mesh = cpu_mesh(8, axis="batch")
        got = jax.block_until_ready(solve_batched_sharded(mats, mesh))
        assert np.asarray(got.converged).all()
        # spot-check per-matrix results against independent single solves
        for b in (0, 97, 255):
            want = solve_xla(mats[b], EPS, MAX_ITR)
            assert int(got.rounds[b]) == int(want.rounds)
            assert abs(float(got.eigenvalue[b]) - float(want.eigenvalue)) < 1e-4
        # eigen-pair property across the whole batch
        Av = np.einsum("bij,bj->bi", np.asarray(mats), np.asarray(got.eigenvector))
        lv = np.asarray(got.eigenvalue)[:, None] * np.asarray(got.eigenvector)
        assert np.abs(Av - lv).max() < 1e-2  # 512² f32 row sums: looser atol

    def test_scaling_math(self):
        assert elems_per_second(100, 10, 2.0) == 10 * 100 * 100 / 2.0
        assert weak_scaling_efficiency(8.0, 8, 1.0) == 1.0

    def test_batched_sharded(self, rng):
        mats = jnp.asarray(
            np.stack([rng.random((64, 64), dtype=np.float32) + 1e-4 for _ in range(8)])
        )
        mesh = cpu_mesh(4, axis="batch")
        got = solve_batched_sharded(mats, mesh)
        want = solve_batched(mats, EPS, MAX_ITR)
        np.testing.assert_array_equal(np.asarray(got.rounds), np.asarray(want.rounds))
        np.testing.assert_allclose(
            np.asarray(got.eigenvalue), np.asarray(want.eigenvalue), atol=1e-5
        )


class TestBatchedMixedConvergence:
    def test_cap_hit_subset_keeps_per_matrix_flags(self, rng):
        """A batch where some matrices hit the iteration cap: converged
        flags and round counts must stay per-matrix (the masked loop must
        not freeze early or run-on), matching independent single solves."""
        mats = jnp.asarray(
            np.stack([rng.random((96, 96), dtype=np.float32) + 1e-4 for _ in range(4)])
        )
        from eigen_value_tpu.ops.solver_matvec import solve_matvec

        cap = 2  # below the ~3-4 rounds these need
        got = solve_batched(mats, EPS, cap)
        for b in range(4):
            # solve_matvec is what solve_batched vmaps — bit-comparable
            want = solve_matvec(mats[b], EPS, cap)
            assert bool(got.converged[b]) == bool(want.converged)
            assert int(got.rounds[b]) == int(want.rounds)
            assert float(got.eigenvalue[b]) == pytest.approx(
                float(want.eigenvalue), rel=1e-6
            )
        # sanity: the cap genuinely bites for at least one matrix at cap=2
        full = solve_batched(mats, EPS, 1000)
        assert np.asarray(full.converged).all()
        assert (np.asarray(full.rounds) > cap).any()


def test_batched_storage_dtype_fast_mode(rng):
    """max_eigenvalue_batch honors SolverConfig.storage_dtype (bf16 fast
    mode per matrix; f32 state; near-parity rounds)."""
    from eigen_value_tpu import SolverConfig, max_eigenvalue_batch

    mats = rng.random((3, 128, 128), dtype=np.float32) + 1e-2
    got = max_eigenvalue_batch(mats, SolverConfig(storage_dtype=jnp.bfloat16))
    want = max_eigenvalue_batch(mats)
    assert got.eigenvalue.dtype == jnp.float32
    assert np.asarray(got.converged).all()
    np.testing.assert_allclose(
        np.asarray(got.eigenvalue), np.asarray(want.eigenvalue), rtol=2e-3
    )


def test_batched_sharded_storage_dtype(rng):
    from eigen_value_tpu import SolverConfig

    mats = jnp.asarray(rng.random((8, 64, 64), dtype=np.float32) + 1e-2)
    mesh = cpu_mesh(4, axis="batch")
    got = solve_batched_sharded(
        mats, mesh, config=SolverConfig(storage_dtype=jnp.bfloat16)
    )
    assert got.eigenvalue.dtype == jnp.float32
    assert np.asarray(got.converged).all()
    want = solve_batched(mats, EPS, MAX_ITR)
    np.testing.assert_allclose(
        np.asarray(got.eigenvalue), np.asarray(want.eigenvalue), rtol=2e-3
    )
