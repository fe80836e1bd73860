"""Multi-round Pallas kernel (kernels.multiround / solve_multiround):
chunked-round semantics must be BIT-EXACT with the production loop.

The kernel is the round-3 headline rung (VERDICT r2 item 1): up to
``chunk`` rounds per Pallas invocation, O(n) state carried in VMEM
scratch, stop checked in a per-round prologue with freeze-on-convergence
so chunk boundaries never change the v-sequence.  bench.py uses it with
chunk = rounds+1 as the flagship path; these tests pin the equivalence
on the interpret backend (the CI sanitizer), and tests/test_tpu_hw.py
re-pins round parity on silicon.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eigen_value_tpu import fixtures
from eigen_value_tpu.config import EPS, MAX_ITR
from eigen_value_tpu.ops.solver_matvec import (
    solve_matvec,
    solve_matvec_pallas,
    solve_multiround,
)


def _assert_same(got, want, bitexact=True):
    assert int(got.rounds) == int(want.rounds)
    assert bool(got.converged) == bool(want.converged)
    if bitexact:
        assert float(got.eigenvalue) == float(want.eigenvalue)
        np.testing.assert_array_equal(
            np.asarray(got.eigenvector), np.asarray(want.eigenvector)
        )
    else:
        assert float(got.eigenvalue) == pytest.approx(
            float(want.eigenvalue), rel=1e-5
        )


@pytest.mark.parametrize("n", [128, 256, 512])
def test_vpu_bitexact_vs_production(n):
    """The 'vpu' formulation uses the production matvec kernel's exact
    reduction (broadcast-multiply + lane reduce), so results must be
    bit-identical to solve_matvec_pallas — eigenvector included."""
    H = fixtures.hilbert_matrix(n)
    want = solve_matvec_pallas(H, EPS, MAX_ITR, interpret=True)
    got = solve_multiround(H, EPS, MAX_ITR, chunk=18, interpret=True)
    _assert_same(got, want, bitexact=True)


@pytest.mark.parametrize("chunk", [1, 2, 3, 5, 7, 16, 40])
def test_chunk_boundaries_are_invisible(chunk):
    """Any chunking of the round sequence must give the same rounds, λ,
    and eigenvector — the freeze-at-convergence semantics."""
    H = fixtures.hilbert_matrix(256)
    want = solve_matvec_pallas(H, EPS, MAX_ITR, interpret=True)
    got = solve_multiround(H, EPS, MAX_ITR, chunk=chunk, interpret=True)
    _assert_same(got, want, bitexact=True)


def test_dot_formulation_round_parity():
    """The MXU dot_general formulation reduces in a different f32 order
    (ulp-level v differences): round counts and λ must still match the
    parity table / production to tolerance."""
    for n in (128, 256):
        H = fixtures.hilbert_matrix(n)
        got = solve_multiround(
            H, EPS, MAX_ITR, chunk=12, interpret=True, formulation="dot"
        )
        assert int(got.rounds) == fixtures.HILBERT_ROUNDS[n]
        want = solve_matvec(H, EPS, MAX_ITR)
        assert float(got.eigenvalue) == pytest.approx(
            float(want.eigenvalue), rel=1e-5
        )


@pytest.mark.parametrize("cap", [0, 1, 3, 9, 10, 11])
def test_cap_exhaustion_matches_production(cap):
    """rounds == cap, converged False, λ = last CHECKED round's v[0] —
    including caps that land mid-chunk and exactly at a chunk edge."""
    H = fixtures.hilbert_matrix(256)
    want = solve_matvec_pallas(H, EPS, cap, interpret=True)
    got = solve_multiround(H, EPS, cap, chunk=4, interpret=True)
    _assert_same(got, want, bitexact=True)


def test_round_zero_convergence():
    M = jnp.full((128, 128), 0.25, jnp.float32)
    got = solve_multiround(M, EPS, MAX_ITR, chunk=4, interpret=True)
    assert bool(got.converged) and int(got.rounds) == 0
    assert float(got.eigenvalue) == pytest.approx(32.0, abs=1e-3)


def test_ev0_threading_is_scale_invariant():
    """The bench chains thread dependence through ev0 — λ and rounds must
    be unchanged (scale invariance of the iteration)."""
    H = fixtures.hilbert_matrix(128)
    base = solve_multiround(H, EPS, MAX_ITR, chunk=10, interpret=True)
    ev0 = jnp.ones((128,), jnp.float32) * jnp.float32(1.0)
    got = solve_multiround(H, EPS, MAX_ITR, chunk=10, interpret=True, ev0=ev0)
    assert int(got.rounds) == int(base.rounds)
    assert float(got.eigenvalue) == float(base.eigenvalue)


def test_relative_eps_mode():
    """eps_mode='relative' in-kernel matches the XLA relative-stop solver."""
    A = jnp.asarray(
        np.random.default_rng(7).random((128, 128), np.float32) + 0.1
    ) * jnp.float32(1e5)
    want = solve_matvec(A, EPS, MAX_ITR, eps_mode="relative")
    got = solve_multiround(
        A, EPS, MAX_ITR, chunk=8, interpret=True, eps_mode="relative"
    )
    assert int(got.rounds) == int(want.rounds)
    assert bool(got.converged)
    assert float(got.eigenvalue) == pytest.approx(
        float(want.eigenvalue), rel=1e-5
    )


def test_unaligned_dim_picks_divisor_stripe():
    """n = 96 (not a multiple of 256): the kernel shrinks the row stripe
    to a divisor (multiple of 8) instead of failing."""
    H = fixtures.hilbert_matrix(96)
    want = solve_matvec(H, EPS, MAX_ITR)
    got = solve_multiround(H, EPS, MAX_ITR, chunk=8, interpret=True)
    assert int(got.rounds) == int(want.rounds)
    assert float(got.eigenvalue) == pytest.approx(
        float(want.eigenvalue), rel=1e-5
    )


def test_tiny_unalignable_dim_raises():
    with pytest.raises(ValueError, match="row stripe"):
        solve_multiround(
            jnp.asarray(fixtures.ANCHOR_3X3, jnp.float32),
            EPS,
            MAX_ITR,
            chunk=4,
            interpret=True,
        )


def test_config_backend_multiround():
    """The 'multiround' backend is reachable through the public config
    (SolverConfig(backend="multiround", chunk=...) → max_eigenvalue)."""
    from eigen_value_tpu import SolverConfig, max_eigenvalue

    H = fixtures.hilbert_matrix(256)
    res = max_eigenvalue(
        H, SolverConfig(backend="multiround", chunk=11, interpret=True)
    )
    assert int(res.rounds) == fixtures.HILBERT_ROUNDS[256]
    assert bool(res.converged)
    with pytest.raises(ValueError, match="chunk"):
        SolverConfig(backend="multiround", chunk=0)


def test_multiround_bf16_storage():
    """storage_dtype composes with multiround: bf16 matrix, f32 state —
    rounds within ±1 of the storage-path solver, λ within the documented
    ~1e-3 relative (product precision differs: the kernel multiplies
    f32-upcast bf16 values, tighter than jnp.dot's bf16 products)."""
    from eigen_value_tpu import SolverConfig, max_eigenvalue
    from eigen_value_tpu.ops.solver_matvec import solve_matvec_storage

    H = fixtures.hilbert_matrix(256)
    want = solve_matvec_storage(H, EPS, MAX_ITR)
    got = max_eigenvalue(
        H,
        SolverConfig(
            backend="multiround",
            chunk=12,
            storage_dtype=jnp.bfloat16,
            interpret=True,
        ),
    )
    assert abs(int(got.rounds) - int(want.rounds)) <= 1
    assert bool(got.converged)
    assert float(got.eigenvalue) == pytest.approx(
        float(want.eigenvalue), rel=2e-3
    )
    assert got.eigenvalue.dtype == jnp.float32  # state stays f32


def test_batched_and_large_suite_row_schemas():
    """The round-3 suite rungs emit self-describing rows (CPU smoke; the
    silicon artifacts are docs/bench/batched_tpu_r3.jsonl /
    large_r3.jsonl)."""
    from eigen_value_tpu.bench.suite import bench_batched

    (r,) = bench_batched(batch=4, dim=64, reps=2, chain=3)
    for key in (
        "solves_per_s",
        "rounds_hist",
        "all_converged",
        "max_rel_residual",
        "rounds_ok",
    ):
        assert key in r, key
    assert r["all_converged"] and r["rounds_ok"]


def test_jittable_and_composes():
    H = fixtures.hilbert_matrix(128)
    res = jax.jit(
        lambda A: solve_multiround(A, EPS, MAX_ITR, chunk=10, interpret=True)
    )(H)
    assert int(res.rounds) == fixtures.HILBERT_ROUNDS[128]
