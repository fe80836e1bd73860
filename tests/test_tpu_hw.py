"""Opt-in REAL-TPU tests — set ``RUN_TPU_TESTS=1`` to enable.

The default suite pins JAX to the virtual CPU mesh (conftest.py); these
tests explicitly target the attached TPU through the device-pinned API,
exercising the compiled (non-interpret) Pallas path and hardware round
parity.  Run:

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -q
"""

import os

import numpy as np
import pytest

import jax

from eigen_value_tpu import EigenValue, SolverConfig, fixtures

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS"),
    reason="set RUN_TPU_TESTS=1 (needs a real TPU attached)",
)


def _tpu():
    try:
        return jax.devices("tpu")[0]
    except RuntimeError:
        pytest.skip("no TPU device visible")


@pytest.mark.parametrize("n", [1024, 4096])
def test_round_parity_on_hardware(n):
    ev = EigenValue(device=_tpu())
    lam, vec, ms, rounds = ev.similarity_transform(
        np.asarray(fixtures.hilbert_matrix(n))
    )
    assert rounds == fixtures.HILBERT_ROUNDS[n]
    H = np.asarray(fixtures.hilbert_matrix(n))
    assert np.allclose(H @ vec, lam * vec, atol=1e-3)


def test_compiled_pallas_backend_selected():
    ev = EigenValue(device=_tpu())
    backend_key = None
    ev.similarity_transform(np.asarray(fixtures.hilbert_matrix(512)))
    (backend_key,) = ev._compiled.keys()
    assert backend_key[2] == "matvec_pallas"  # compiled, not interpreted


def test_bf16_fast_mode_on_hardware():
    import jax.numpy as jnp

    ev = EigenValue(
        SolverConfig(storage_dtype=jnp.bfloat16), device=_tpu()
    )
    H = np.asarray(fixtures.hilbert_matrix(1024))
    lam, vec, ms, rounds = ev.similarity_transform(H)
    assert abs(rounds - fixtures.HILBERT_ROUNDS[1024]) <= 1
    # bf16 storage quantizes A to ~3 digits: λ within ~2e-3 relative of
    # the f32 path, and the eigen-pair property holds at that tolerance
    lam32, _, _, _ = EigenValue(device=_tpu()).similarity_transform(H)
    assert abs(lam - lam32) < 2e-3 * lam32
    assert np.allclose(H @ vec, lam * vec, atol=5e-3)


def test_flagship_8192_parity_on_hardware():
    """The flagship dim itself — parity + λ + eigen-pair property on the
    chip (VERDICT r1: the hw gate stopped at 4096)."""
    ev = EigenValue(device=_tpu())
    H = np.asarray(fixtures.hilbert_matrix(8192))
    lam, vec, ms, rounds = ev.similarity_transform(H)
    assert rounds == fixtures.HILBERT_ROUNDS[8192] == 17
    assert lam == pytest.approx(2.59999, abs=1e-3)
    assert np.allclose(H @ vec, lam * vec, atol=1e-3)


def _tpu_mesh(shape=None, axes=("rows",)):
    from jax.sharding import Mesh

    devs = np.array([_tpu()])
    if shape is not None:
        devs = devs.reshape(shape)
    return Mesh(devs, axes)


def test_exported_artifact_runs_on_hardware(tmp_path):
    """The serving contract on silicon: a cross-lowered TPU artifact
    (production matvec_pallas backend, exportable from any host) loads
    and solves with round parity on the chip."""
    from eigen_value_tpu.utils import aot

    cfg = SolverConfig(backend="matvec_pallas", interpret=False)
    path = aot.save_exported(
        aot.export_solver(1024, cfg, platforms=("tpu",)),
        str(tmp_path / "solver_tpu.bin"),
    )
    # Commit the input to the TPU: Exported.call lowers for the platform
    # the call executes on, and conftest pins jax_default_device to CPU
    # even under RUN_TPU_TESTS=1 — an uncommitted numpy arg would lower
    # this tpu-only artifact for ('cpu',) and raise (diagnosed 2026-08-18,
    # scratch/diag_export_hw.py: standalone the uncommitted call passes).
    A = jax.device_put(np.asarray(fixtures.hilbert_matrix(1024)), _tpu())
    res = aot.load_exported(path).call(A)
    assert int(res.rounds) == fixtures.HILBERT_ROUNDS[1024]


class TestCompiledShardedOnHardware:
    """The production multi-chip code paths COMPILED on real TPU silicon
    (VERDICT r1 item 2: until round 2 they had only ever run in Pallas
    interpret mode on the virtual CPU mesh).  A 1-device TPU mesh runs the
    full shard_map + Mosaic lowering; collective degeneracy (P=1) is
    irrelevant to what is being de-risked — that the lowering compiles and
    executes with parity."""

    def test_sharded_matvec_compiled_pallas(self):
        from eigen_value_tpu.parallel.sharded import solve_sharded_matvec

        H = fixtures.hilbert_matrix(2048)
        got = jax.block_until_ready(
            solve_sharded_matvec(H, _tpu_mesh(), use_pallas=True)
        )
        assert int(got.rounds) == fixtures.HILBERT_ROUNDS[2048]
        assert bool(got.converged)
        assert float(got.eigenvalue) == pytest.approx(2.50355, abs=1e-3)

    def test_sharded_ring_compiled(self):
        from eigen_value_tpu.parallel.sharded import solve_sharded_matvec_ring

        H = fixtures.hilbert_matrix(1024)
        got = jax.block_until_ready(solve_sharded_matvec_ring(H, _tpu_mesh()))
        assert int(got.rounds) == fixtures.HILBERT_ROUNDS[1024]
        assert bool(got.converged)

    def test_sharded_iterated_compiled(self):
        from eigen_value_tpu.parallel.sharded import solve_sharded

        H = fixtures.hilbert_matrix(512)
        got = jax.block_until_ready(solve_sharded(H, _tpu_mesh()))
        assert int(got.rounds) == fixtures.HILBERT_ROUNDS[512]

    def test_sharded_storage_bf16_compiled(self):
        import jax.numpy as jnp

        from eigen_value_tpu.parallel.sharded import solve_sharded_matvec

        H = fixtures.hilbert_matrix(1024)
        got = jax.block_until_ready(
            solve_sharded_matvec(
                H, _tpu_mesh(), config=SolverConfig(storage_dtype=jnp.bfloat16)
            )
        )
        assert bool(got.converged)
        assert abs(int(got.rounds) - fixtures.HILBERT_ROUNDS[1024]) <= 1
        assert float(got.eigenvalue) == pytest.approx(2.44555, rel=2e-3)

    def test_batched_sharded_compiled(self):
        from eigen_value_tpu.parallel.batched import solve_batched_sharded

        As = np.stack([np.asarray(fixtures.hilbert_matrix(256))] * 2)
        got = jax.block_until_ready(
            solve_batched_sharded(As, _tpu_mesh(axes=("batch",)))
        )
        assert (np.asarray(got.rounds) == fixtures.HILBERT_ROUNDS[256]).all()

    def test_batched_rowsharded_2d_compiled(self):
        from eigen_value_tpu.parallel.sharded import solve_batched_rowsharded

        As = np.stack([np.asarray(fixtures.hilbert_matrix(256))] * 2)
        got = jax.block_until_ready(
            solve_batched_rowsharded(
                As, _tpu_mesh(shape=(1, 1), axes=("batch", "rows"))
            )
        )
        assert (np.asarray(got.rounds) == fixtures.HILBERT_ROUNDS[256]).all()

    def test_sharded_2d_block_compiled(self):
        from eigen_value_tpu.parallel.sharded import solve_sharded_2d

        H = fixtures.hilbert_matrix(1024)
        got = jax.block_until_ready(
            solve_sharded_2d(H, _tpu_mesh(shape=(1, 1), axes=("rows", "cols")))
        )
        assert int(got.rounds) == fixtures.HILBERT_ROUNDS[1024]
        assert bool(got.converged)
        assert float(got.eigenvalue) == pytest.approx(2.44555, abs=1e-3)


@pytest.mark.parametrize("n", [96, 128, 512, 2048])
def test_multiround_parity_on_hardware(n):
    """The round-3 multi-round kernel (bench.py's headline path) compiled
    on silicon: round parity, λ, convergence — at a chunk that splits the
    round sequence mid-solve AND at the bench's exact-fit chunk.

    n=96 exercises the NON-lane-aligned fallback compiled by Mosaic
    (8-aligned stripe, padded lane tiles for the roll/transpose — advisor
    r3: it only ever ran in interpret mode); no parity-table entry exists
    there, so the anchor is the single-round solver on the same device
    with a ±1 round slack for the kernels' different f32 dot orders."""
    import jax.numpy as jnp

    from eigen_value_tpu.config import EPS, MAX_ITR
    from eigen_value_tpu.ops.solver_matvec import solve_matvec, solve_multiround

    H = jax.device_put(np.asarray(fixtures.hilbert_matrix(n)), _tpu())
    if n in fixtures.HILBERT_ROUNDS:
        want, slack = fixtures.HILBERT_ROUNDS[n], 0
    else:
        want = int(jax.block_until_ready(solve_matvec(H, EPS, MAX_ITR)).rounds)
        slack = 1
    for chunk in (5, want + 1):
        res = jax.block_until_ready(
            solve_multiround(H, EPS, MAX_ITR, chunk=chunk)
        )
        assert abs(int(res.rounds) - want) <= slack, (n, chunk)
        assert bool(res.converged)
    vec = np.asarray(res.eigenvector)
    lam = float(res.eigenvalue)
    Hn = np.asarray(fixtures.hilbert_matrix(n))
    assert np.allclose(Hn @ vec, lam * vec, atol=1e-3)


@pytest.mark.parametrize(
    "n,tile",
    [(1024, 512), (1024, 1024), (2048, 256), (2048, 512), (8192, 512)],
)
def test_multiround_sym_parity_on_hardware(n, tile):
    """The round-4 SYMMETRIC multi-round kernel (bench.py's headline
    path) compiled on silicon: exact round parity with the Hilbert table,
    λ, convergence, A·v ≈ λ·v — at a chunk that splits the round sequence
    mid-solve AND at the bench's exact-fit chunk, across tile edges that
    exercise the triangle enumeration (n/tile ∈ {1, 2, 4, 8, 16} grids).
    Until this test the sym kernel had only interpret-mode coverage;
    bench.py now headlines it, so Mosaic-compiled behavior is the
    production path (same gap class as VERDICT r3 item 2).  The 8192²
    case (VERDICT r4 item 3) pins direct correctness at the exact dim
    the record is claimed at — not just gate timing."""
    from eigen_value_tpu.config import EPS, MAX_ITR
    from eigen_value_tpu.ops.solver_matvec import solve_multiround

    H = jax.device_put(np.asarray(fixtures.hilbert_matrix(n)), _tpu())
    want = fixtures.HILBERT_ROUNDS[n]
    for chunk in (5, want + 1):
        res = jax.block_until_ready(
            solve_multiround(
                H, EPS, MAX_ITR, chunk=chunk, symmetric=True, tile=tile
            )
        )
        assert int(res.rounds) == want, (n, tile, chunk)
        assert bool(res.converged)
    vec = np.asarray(res.eigenvector)
    lam = float(res.eigenvalue)
    Hn = np.asarray(fixtures.hilbert_matrix(n))
    assert np.allclose(Hn @ vec, lam * vec, atol=1e-3)


@pytest.mark.parametrize("n,tiles", [(2048, 4), (8192, 64), (8192, 96)])
def test_multiround_sym_cached_parity_on_hardware(n, tiles):
    """The round-5 VMEM-cached variant compiled on silicon: the packed
    resident cache (up to 96 MiB at 8192²/96 tiles) must produce the
    exact Hilbert round counts and an eigen-pair that satisfies
    A·v ≈ λ·v at the flagship dim — the headline configuration's direct
    correctness coverage (kernels.sym_cache_split; the in-kernel DMA
    fill has no interpret-mode analog of Mosaic's real semaphores)."""
    from eigen_value_tpu.config import EPS, MAX_ITR
    from eigen_value_tpu.ops.solver_matvec import solve_multiround

    H = jax.device_put(np.asarray(fixtures.hilbert_matrix(n)), _tpu())
    want = fixtures.HILBERT_ROUNDS[n]
    for chunk in (5, want + 1):
        res = jax.block_until_ready(
            solve_multiround(
                H, EPS, MAX_ITR, chunk=chunk, symmetric=True, tile=512,
                cache_tiles=tiles,
            )
        )
        assert int(res.rounds) == want, (n, tiles, chunk)
        assert bool(res.converged)
    vec = np.asarray(res.eigenvector)
    lam = float(res.eigenvalue)
    Hn = np.asarray(fixtures.hilbert_matrix(n))
    assert np.allclose(Hn @ vec, lam * vec, atol=1e-3)


def test_retained_rung_parity_on_hardware():
    """The two round-5c retained measured-negative rungs compiled on
    silicon (docs/BENCH_RESULTS.md round 5c): the "mixed" formulation
    (an MXU share of the cached tiles through dot_general) and the
    pipelined wait-at-first-use cache fill.  Neither is a production
    default; both must stay round/λ/eigen-pair correct so a future
    compiler/chip recheck starts from a known-good rung."""
    from eigen_value_tpu.config import EPS, MAX_ITR
    from eigen_value_tpu.ops.solver_matvec import solve_multiround

    n = 2048
    H = jax.device_put(np.asarray(fixtures.hilbert_matrix(n)), _tpu())
    want = fixtures.HILBERT_ROUNDS[n]
    Hn = np.asarray(fixtures.hilbert_matrix(n))
    for kw in (
        dict(formulation="mixed"),  # auto mxu share
        dict(formulation="mixed", mxu_tiles=2),
        dict(fill_mode="pipelined"),
        # combined: the MXU share's issue/wait branches of the
        # pipelined fill execute only with both knobs set
        dict(formulation="mixed", fill_mode="pipelined"),
    ):
        res = jax.block_until_ready(
            solve_multiround(
                H, EPS, MAX_ITR, chunk=want + 1, symmetric=True,
                tile=512, cache_tiles=4, **kw,
            )
        )
        assert int(res.rounds) == want, kw
        assert bool(res.converged), kw
        vec = np.asarray(res.eigenvector)
        lam = float(res.eigenvalue)
        assert np.allclose(Hn @ vec, lam * vec, atol=1e-3), kw


def test_multiround_sym_bf16_parity_on_hardware():
    """Symmetric kernel × bf16 storage COMPOSED on silicon — at the
    round-4 tile=1024 uncached configuration AND the round-5 bench bf16
    secondary's exact configuration (tile=512 + 96 cached bf16 tiles;
    the bf16 cache scratch and bf16 DMA fill have no other Mosaic-
    compiled coverage): converges within ±1 round of the f32 table
    (storage-accuracy tolerance) and λ within ~1e-3 relative."""
    import jax.numpy as jnp

    from eigen_value_tpu.config import EPS, MAX_ITR
    from eigen_value_tpu.ops.solver_matvec import solve_multiround

    n = 2048
    H = jax.device_put(np.asarray(fixtures.hilbert_matrix(n)), _tpu())
    f32 = jax.block_until_ready(
        solve_multiround(H, EPS, MAX_ITR, symmetric=True, tile=512)
    )
    for kw in (
        dict(tile=1024),
        dict(tile=512, cache_tiles=4),
    ):
        res = jax.block_until_ready(
            solve_multiround(
                H, EPS, MAX_ITR, chunk=fixtures.HILBERT_ROUNDS[n] + 2,
                symmetric=True, storage_dtype=jnp.bfloat16, **kw,
            )
        )
        assert abs(int(res.rounds) - fixtures.HILBERT_ROUNDS[n]) <= 1, kw
        assert bool(res.converged), kw
        assert float(res.eigenvalue) == pytest.approx(
            float(f32.eigenvalue), rel=2e-3
        ), kw
    # the bench secondary's flagship shape: 8192², tile=512, cache=96
    H8 = jax.device_put(
        np.asarray(fixtures.hilbert_matrix(8192), np.float32), _tpu()
    )
    res8 = jax.block_until_ready(
        solve_multiround(
            H8, EPS, MAX_ITR, chunk=fixtures.HILBERT_ROUNDS[8192] + 2,
            symmetric=True, tile=512, cache_tiles=96,
            storage_dtype=jnp.bfloat16,
        )
    )
    assert abs(int(res8.rounds) - fixtures.HILBERT_ROUNDS[8192]) <= 1
    assert bool(res8.converged)
    assert float(res8.eigenvalue) == pytest.approx(2.6, rel=2e-3)


class TestOperatorsOnHardware:
    """Matrix-free operators COMPILED on silicon (VERDICT r2 item 2: the
    round-2 operator artifact recorded a silent Kronecker cap-exhaustion
    on TPU — default MXU bf16 precision vs the absolute stop — and no hw
    test existed to catch it).  These gate that failure class."""

    def test_fft_hankel_converges(self):
        from eigen_value_tpu import max_eigenvalue_operator
        from eigen_value_tpu.ops.structured import hilbert_matvec

        n = 1024
        res = jax.block_until_ready(
            jax.jit(lambda: max_eigenvalue_operator(hilbert_matvec(n), n))()
        )
        assert bool(res.converged)
        assert abs(int(res.rounds) - fixtures.HILBERT_ROUNDS[n]) <= 1
        assert float(res.eigenvalue) == pytest.approx(2.44555, rel=1e-3)

    def test_fft_operator_eager_dispatch(self):
        """EAGER (op-by-op) use of the FFT operator over the tunnel.
        The factory's host complex64 spectrum is rebuilt on device from
        f32 halves (structured._spectrum_operand) because complex64
        host→device transfers are UNIMPLEMENTED on this transport — an
        eager `solve_operator(hilbert_matvec(8192), …)` died exactly
        there (2026-08-20) and the failed transfer poisoned every
        subsequent dispatch in the process.  Eager must now match jit."""
        from eigen_value_tpu.ops.structured import hilbert_matvec

        n = 8192
        mv = hilbert_matvec(n)
        x = jax.device_put(np.ones(n, np.float32), _tpu())
        eager = np.asarray(jax.block_until_ready(mv(x)))
        jitted = np.asarray(jax.block_until_ready(jax.jit(mv)(x)))
        assert np.allclose(eager, jitted, rtol=1e-5, atol=1e-5)

    def test_kron_converges_with_f32_precision(self):
        """The exact round-2 silicon failure (operator_tpu_r2.jsonl row 3):
        32×32 Kronecker factors, λ ≈ 300, ABSOLUTE stop — must now
        converge thanks to the Precision.HIGHEST pin in kron_matvec."""
        from eigen_value_tpu.config import EPS, MAX_ITR
        from eigen_value_tpu.ops.solver_matvec import solve_matvec, solve_operator
        from eigen_value_tpu.ops.structured import kron_matvec

        key = jax.random.key(1024)
        kb, kc = jax.random.split(key)
        B = jax.random.uniform(kb, (32, 32), minval=0.1, maxval=1.0)
        C = jax.random.uniform(kc, (32, 32), minval=0.1, maxval=1.0)
        res = jax.block_until_ready(
            jax.jit(
                lambda B, C: solve_operator(
                    kron_matvec(B, C), 1024, EPS, MAX_ITR
                )
            )(B, C)
        )
        assert bool(res.converged), "kron cap-exhausted on TPU again"
        lam_prod = float(solve_matvec(B, EPS, MAX_ITR).eigenvalue) * float(
            solve_matvec(C, EPS, MAX_ITR).eigenvalue
        )
        assert float(res.eigenvalue) == pytest.approx(lam_prod, rel=2e-3)

    def test_large_lambda_kron_converges_relative(self):
        """λ ≈ λ_B·λ_C ~ 10³ (64×128 factors): beyond the absolute stop's
        f32 soundness limit — must converge under eps_mode='relative'
        (VERDICT r2 item 3's done-criterion)."""
        from eigen_value_tpu.config import EPS, MAX_ITR
        from eigen_value_tpu.ops.solver_matvec import solve_matvec, solve_operator
        from eigen_value_tpu.ops.structured import kron_matvec

        key = jax.random.key(8192)
        kb, kc = jax.random.split(key)
        B = jax.random.uniform(kb, (64, 64), minval=0.1, maxval=1.0)
        C = jax.random.uniform(kc, (128, 128), minval=0.1, maxval=1.0)
        res = jax.block_until_ready(
            jax.jit(
                lambda B, C: solve_operator(
                    kron_matvec(B, C), 8192, EPS, MAX_ITR, eps_mode="relative"
                )
            )(B, C)
        )
        assert bool(res.converged)
        lam_prod = float(solve_matvec(B, EPS, MAX_ITR).eigenvalue) * float(
            solve_matvec(C, EPS, MAX_ITR).eigenvalue
        )
        assert float(res.eigenvalue) == pytest.approx(lam_prod, rel=3e-3)

    def test_sparse_ell_converges(self):
        from eigen_value_tpu.config import EPS, MAX_ITR
        from eigen_value_tpu.ops.solver_matvec import solve_operator
        from eigen_value_tpu.ops.structured import ell_from_coo, ell_matvec

        n, deg = 1024, 8
        rng = np.random.default_rng(n)
        src = np.repeat(np.arange(n), deg)
        dst = (src + 1 + rng.integers(0, n - 1, size=src.shape)) % n
        vals = (rng.random(src.shape[0]) + 0.1).astype(np.float32)
        rows = np.concatenate([src, np.arange(n)])
        cols = np.concatenate([dst, np.arange(n)])
        v = np.concatenate([vals, np.ones(n, np.float32)])
        mv = ell_matvec(*ell_from_coo(rows, cols, v, n))
        res = jax.block_until_ready(
            jax.jit(lambda: solve_operator(mv, n, EPS, MAX_ITR))()
        )
        assert bool(res.converged)
        resid = float(
            jax.numpy.max(
                jax.numpy.abs(
                    mv(res.eigenvector) - res.eigenvalue * res.eigenvector
                )
            )
        )
        assert resid <= 1e-2 * float(res.eigenvalue)


@pytest.mark.slow
def test_max_size_solves_on_hardware():
    """The max-size rungs as a regression test (VERDICT r2 item 5): the
    32768² f32 and 65536² bf16 solves must converge with the pinned
    rounds/λ, in both the dense and — since round 5 — the symmetric
    cached backends (artifact rows: docs/bench/large_r5.jsonl).  ~8 min
    (generation + compile dominate); excluded by `-m "not slow"`."""
    from eigen_value_tpu.bench.suite import bench_large

    # conftest pins jax_default_device to CPU even under RUN_TPU_TESTS=1;
    # the suite builds its matrices on the default device, so point it at
    # the chip for the duration (outside pytest the CLI sees the TPU
    # default and needs no such override)
    with jax.default_device(_tpu()):
        rows = bench_large(reps=1)
    assert {r["backend"] for r in rows} == {
        "f32_32768", "sym_f32_32768", "bf16_65536", "sym_bf16_65536",
    }
    for r in rows:
        assert "error" not in r, r
        assert r["converged"] and r["rounds_ok"], r


def test_batched_throughput_on_hardware():
    """Reduced-batch config-4 sanity (VERDICT r2 item 4): a 32×512²
    random-positive batch must fully converge on the chip (the f32
    precision pin in solve_matvec — λ ≈ n/2 breaks at default MXU
    precision) and sustain a sane throughput."""
    from eigen_value_tpu.bench.suite import bench_batched

    rows = bench_batched(batch=32, dim=512, reps=3, chain=4)
    (r,) = rows
    assert r["all_converged"], r
    assert r["rounds_ok"], r
    assert r["solves_per_s"] > 500, r


class TestHardwarePerfGate:
    """Perf REGRESSION gate (VERDICT r1 item 5): a kernel regression must
    fail a test, not just drift in BENCH_r*.json.  Thresholds allow for
    the chip's measured state drift (745–930 GB/s across minutes,
    docs/BENCH_RESULTS.md round 2) while catching structural regressions."""

    DIM = 8192

    def test_matvec_marginal_at_least_80pct_roofline(self):
        import jax.numpy as jnp

        from eigen_value_tpu.ops.pallas import kernels
        from eigen_value_tpu.utils.timing import (
            detect_peak_hbm_gbps,
            time_marginal,
        )

        tpu = _tpu()
        H = jax.device_put(
            np.asarray(fixtures.hilbert_matrix(self.DIM)), tpu
        )
        x = jax.device_put(np.ones(self.DIM, np.float32), tpu)
        from eigen_value_tpu.device import matvec_blocks

        br, bc = matvec_blocks(self.DIM)

        def step(i, s):
            Hi, xi = s
            return (Hi, kernels.matvec(Hi, xi, block_rows=br, block_cols=bc))

        ms = time_marginal(step, (H, x), k=64)
        peak = detect_peak_hbm_gbps()
        gbps = self.DIM * self.DIM * 4 / (ms * 1e-3) / 1e9
        assert gbps >= 0.8 * peak, (
            f"matvec sustains {gbps:.0f} GB/s < 80% of {peak:.0f} GB/s "
            f"nominal ({ms*1e3:.0f} us/pass) — kernel regression"
        )

    def test_headline_chain_within_tolerance(self):
        """Full-solve chained differencing over the MATVEC-LOOP backend
        must stay under 8.0 ms — the production path for arbitrary dims
        (the headline backend itself, multiround, has its own gate below:
        test_multiround_headline_gate).  Recorded bests: 6.19 ms via
        multiround (docs/bench/headline_r3.json), ~6.4 via this loop;
        the slow-state 18-pass floor is ~6.4 — anything over 8 is a
        structural regression (e.g. an extra O(n²) pass lands at ~9.8)."""
        import time as _time

        import jax.numpy as jnp
        from jax import lax

        from eigen_value_tpu.config import EPS, MAX_ITR
        from eigen_value_tpu.device import matvec_blocks
        from eigen_value_tpu.ops.pallas import kernels
        from eigen_value_tpu.ops.solver_matvec import solve_matvec_loop

        br, bc = matvec_blocks(self.DIM)
        H = jax.device_put(
            np.asarray(fixtures.hilbert_matrix(self.DIM)), _tpu()
        )

        def chain(k):
            @jax.jit
            def run(H):
                def body(i, acc):
                    s = jnp.float32(1.0) + acc * jnp.float32(1e-38)

                    def matvec(ev):
                        return kernels.matvec(
                            H, ev, block_rows=br, block_cols=bc
                        ) / ev

                    ev0 = jnp.ones((self.DIM,), jnp.float32) * s
                    return solve_matvec_loop(
                        H, matvec, EPS, MAX_ITR, ev0=ev0
                    ).eigenvalue

                return lax.fori_loop(0, k, body, jnp.float32(0.0))

            return run

        # CHIP-STATE-RELATIVE bound (VERDICT r2 item 8): the fixed 8.0 ms
        # gate has ~20% headroom in the slow state, so a sub-20%
        # structural regression could hide inside it.  Normalize by the
        # matvec pass marginal sampled BEFORE AND AFTER the chain (the
        # chip state drifts on a minutes timescale — a single sample can
        # race the drift, observed 2026-08-19: one chain run caught a
        # slow phase while the lone marginal caught a fast one and the
        # gate false-positived): bound = 18 × max(pass samples) × 1.10 +
        # 0.25 ms fixed slack (the solve's own structure overhead
        # measures ≤ 5% of the pass budget; dry run
        # scratch/exp_gate_dryrun.py: a +2-pass/solve injected regression
        # fails this bound in every chip state while passing 8.0; the
        # per-pass 80%-roofline test above covers kernel-level
        # regressions).  The fixed 8.0 stays as the hard backstop.
        from eigen_value_tpu.utils.timing import time_marginal

        def pass_step(i, s):
            Hi, xi = s
            return (Hi, kernels.matvec(Hi, xi, block_rows=br, block_cols=bc))

        x = jax.device_put(np.ones(self.DIM, np.float32), _tpu())
        long, short = chain(9), chain(1)
        float(np.asarray(long(H)))
        float(np.asarray(short(H)))
        pass_before = time_marginal(pass_step, (H, x), k=64)
        best = float("inf")
        for _ in range(5):
            t0 = _time.perf_counter()
            float(np.asarray(long(H)))
            tl = (_time.perf_counter() - t0) * 1e3
            t0 = _time.perf_counter()
            float(np.asarray(short(H)))
            ts = (_time.perf_counter() - t0) * 1e3
            best = min(best, (tl - ts) / 8)
        assert best < 8.0, f"headline chain {best:.2f} ms/solve (> 8.0)"
        pass_after = time_marginal(pass_step, (H, x), k=64)
        pass_ms = max(pass_before, pass_after)
        bound = 18 * pass_ms * 1.10 + 0.25
        assert best < bound, (
            f"headline chain {best:.2f} ms vs chip-state bound {bound:.2f} "
            f"(pass marginals {pass_before * 1e3:.0f}/{pass_after * 1e3:.0f} us)"
            f" — structural regression"
        )

    def test_multiround_headline_gate(self):
        """The HEADLINE backend (bench.py: multiround kernel, exact-fit
        chunk) gated chip-state-relative, plus the A/B invariant that
        justifies its existence: multiround must not lose to the
        matvec-loop chain, compared via PER-REP deltas (both arms run
        inside each ~0.5 s rep, so the chip-state drift — minutes
        timescale — cancels; independent per-arm minima do NOT cancel
        it: a state flip during one arm's slot produced a sub-floor
        5.70 ms artifact in the first dry run).  VERDICT r3 item 2:
        until round 4 the only silicon perf gate chained the OLD loop
        backend, so a Mosaic change stalling the multiround kernel's
        block streaming failed no test.  Dry-run validated
        (scratch/exp_multiround_gate_dryrun.{py,out}): an injected
        streaming regression (block_rows=8 → inefficient DMAs, 8.66 ms
        = +35%) fails the chip-state bound AND the A/B invariant in
        every chip state; healthy multiround measures median(A−loop)
        ≈ −0.10 ms.  (chunk=1 measures only ~+0.1 ms — round 3's
        "~50 µs/round restart" was mostly chip-state lottery, so
        per-invocation restart is NOT the regression class this gates.)

        Also pins the auto routing on silicon: resolve_backend must pick
        multiround at the flagship dim (VERDICT r3 item 4:
        `max_eigenvalue(H_8192)` uses the backend bench.py measures)."""
        import time as _time

        import jax.numpy as jnp
        from jax import lax

        from eigen_value_tpu import SolverConfig
        from eigen_value_tpu.api import resolve_backend
        from eigen_value_tpu.config import EPS, MAX_ITR
        from eigen_value_tpu.device import matvec_blocks
        from eigen_value_tpu.ops.pallas import kernels
        from eigen_value_tpu.ops.solver_matvec import (
            solve_matvec_loop,
            solve_multiround,
        )
        from eigen_value_tpu.utils.timing import time_marginal

        tpu = _tpu()
        assert (
            resolve_backend(SolverConfig(), self.DIM, device=tpu)
            == "multiround"
        )
        H = jax.device_put(np.asarray(fixtures.hilbert_matrix(self.DIM)), tpu)
        br, bc = matvec_blocks(self.DIM)
        chunk = fixtures.HILBERT_ROUNDS[self.DIM] + 1  # bench.py's chunk

        def chain_multiround(k):
            @jax.jit
            def run(H):
                def body(i, acc):
                    s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
                    ev0 = jnp.ones((self.DIM,), jnp.float32) * s
                    return solve_multiround(
                        H, EPS, MAX_ITR, chunk=chunk, ev0=ev0
                    ).eigenvalue

                return lax.fori_loop(0, k, body, jnp.float32(0.0))

            return run

        def chain_loop(k):
            @jax.jit
            def run(H):
                def body(i, acc):
                    s = jnp.float32(1.0) + acc * jnp.float32(1e-38)

                    def matvec(ev):
                        return kernels.matvec(
                            H, ev, block_rows=br, block_cols=bc
                        ) / ev

                    ev0 = jnp.ones((self.DIM,), jnp.float32) * s
                    return solve_matvec_loop(
                        H, matvec, EPS, MAX_ITR, ev0=ev0
                    ).eigenvalue

                return lax.fori_loop(0, k, body, jnp.float32(0.0))

            return run

        mr_long, mr_short = chain_multiround(9), chain_multiround(1)
        lp_long, lp_short = chain_loop(9), chain_loop(1)
        for f in (mr_long, mr_short, lp_long, lp_short):
            float(np.asarray(f(H)))  # compile + warm

        def pass_step(i, s):
            Hi, xi = s
            return (Hi, kernels.matvec(Hi, xi, block_rows=br, block_cols=bc))

        x = jax.device_put(np.ones(self.DIM, np.float32), tpu)
        pass_before = time_marginal(pass_step, (H, x), k=64)
        mr_ms, lp_ms = [], []
        for _ in range(7):
            # per-rep interleaving: each rep runs both arms back-to-back
            # (~0.5 s total) so both see the same chip state
            t0 = _time.perf_counter()
            float(np.asarray(mr_long(H)))
            tl = (_time.perf_counter() - t0) * 1e3
            t0 = _time.perf_counter()
            float(np.asarray(mr_short(H)))
            ts = (_time.perf_counter() - t0) * 1e3
            mr_ms.append((tl - ts) / 8)
            t0 = _time.perf_counter()
            float(np.asarray(lp_long(H)))
            tl = (_time.perf_counter() - t0) * 1e3
            t0 = _time.perf_counter()
            float(np.asarray(lp_short(H)))
            ts = (_time.perf_counter() - t0) * 1e3
            lp_ms.append((tl - ts) / 8)
        pass_after = time_marginal(pass_step, (H, x), k=64)
        pass_ms = max(pass_before, pass_after)
        best_mr = min(mr_ms)

        # chip-state-relative bound, same math as the loop gate: 18
        # passes × the same-run pass marginal × 10% + 0.25 ms fixed slack
        bound = 18 * pass_ms * 1.10 + 0.25
        assert best_mr < bound, (
            f"multiround chain {best_mr:.2f} ms vs chip-state bound "
            f"{bound:.2f} (pass marginals {pass_before * 1e3:.0f}/"
            f"{pass_after * 1e3:.0f} us) — block-streaming regression"
        )
        assert best_mr < 8.0, f"multiround chain {best_mr:.2f} ms (> 8.0)"
        # the A/B invariant via the MEDIAN of per-rep deltas: a real
        # regression shifts every rep's delta (+2.3 ms for the injected
        # block_rows=8, dry-run record) while chip-state drift and
        # per-launch jitter (±0.4 ms/rep observed) average out; healthy
        # runs measured medians of −0.10 and +0.04 ms, so 0.15 leaves
        # ~2σ of margin against a false failure and ~15× against the
        # injected regression.
        deltas = sorted(m - l for m, l in zip(mr_ms, lp_ms))
        med = (deltas[(len(deltas) - 1) // 2] + deltas[len(deltas) // 2]) / 2
        assert med <= 0.15, (
            f"multiround LOST to the matvec loop: median per-rep delta "
            f"{med:+.3f} ms (multiround {mr_ms}, loop {lp_ms}) — its "
            f"block streaming regressed"
        )

    def test_multiround_sym_headline_gate(self):
        """The round-4 HEADLINE backend (bench.py: symmetric multiround,
        tile=512, exact-fit chunk) gated chip-state-relative, plus the
        A/B invariant that justifies its existence: the sym chain must
        beat the dense multiround chain by a real margin, compared via
        PER-REP deltas (both arms inside each rep so chip-state drift
        cancels — same protocol as the dense gate above).

        The sym kernel moves frac = 0.5 + 0.5·tile/n ≈ 0.531 of the
        dense bytes, so its chip-state bound is the dense bound × frac;
        the A/B margin requires ≥ 35% of the expected (1−frac)·dense win
        (expected delta ≈ −3.0 ms at 8192²; a regression that silently
        re-streams the full matrix — the only way this kernel can fail
        while staying correct — reads delta ≈ 0).  Sweep record:
        sym512_f32 3.44–3.52 ms vs dense 6.45–6.48 ms in one slow-state
        process (scratch/exp_sym_sweep.py, 2026-08-20)."""
        import time as _time

        import jax.numpy as jnp
        from jax import lax

        from eigen_value_tpu.config import EPS, MAX_ITR
        from eigen_value_tpu.device import matvec_blocks
        from eigen_value_tpu.ops.pallas import kernels
        from eigen_value_tpu.ops.solver_matvec import solve_multiround
        from eigen_value_tpu.utils.timing import time_marginal

        tpu = _tpu()
        H = jax.device_put(np.asarray(fixtures.hilbert_matrix(self.DIM)), tpu)
        br, bc = matvec_blocks(self.DIM)
        chunk = fixtures.HILBERT_ROUNDS[self.DIM] + 1
        tile = 512
        frac = 0.5 + 0.5 * tile / self.DIM

        def chain(k, symmetric):
            @jax.jit
            def run(H):
                def body(i, acc):
                    s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
                    ev0 = jnp.ones((self.DIM,), jnp.float32) * s
                    return solve_multiround(
                        H, EPS, MAX_ITR, chunk=chunk, ev0=ev0,
                        symmetric=symmetric, tile=tile,
                    ).eigenvalue

                return lax.fori_loop(0, k, body, jnp.float32(0.0))

            return run

        sy_long, sy_short = chain(9, True), chain(1, True)
        de_long, de_short = chain(9, False), chain(1, False)
        for f in (sy_long, sy_short, de_long, de_short):
            float(np.asarray(f(H)))  # compile + warm

        def pass_step(i, s):
            Hi, xi = s
            return (Hi, kernels.matvec(Hi, xi, block_rows=br, block_cols=bc))

        x = jax.device_put(np.ones(self.DIM, np.float32), tpu)
        pass_before = time_marginal(pass_step, (H, x), k=64)
        sy_ms, de_ms = [], []
        for _ in range(7):
            t0 = _time.perf_counter()
            float(np.asarray(sy_long(H)))
            tl = (_time.perf_counter() - t0) * 1e3
            t0 = _time.perf_counter()
            float(np.asarray(sy_short(H)))
            ts = (_time.perf_counter() - t0) * 1e3
            sy_ms.append((tl - ts) / 8)
            t0 = _time.perf_counter()
            float(np.asarray(de_long(H)))
            tl = (_time.perf_counter() - t0) * 1e3
            t0 = _time.perf_counter()
            float(np.asarray(de_short(H)))
            ts = (_time.perf_counter() - t0) * 1e3
            de_ms.append((tl - ts) / 8)
        pass_after = time_marginal(pass_step, (H, x), k=64)
        pass_ms = max(pass_before, pass_after)
        best_sy = min(sy_ms)

        # dense chip-state bound × the sym traffic fraction + fixed slack
        bound = 18 * pass_ms * frac * 1.10 + 0.25
        assert best_sy < bound, (
            f"sym chain {best_sy:.2f} ms vs chip-state bound {bound:.2f} "
            f"(pass marginals {pass_before * 1e3:.0f}/"
            f"{pass_after * 1e3:.0f} us) — triangle streaming regression"
        )
        assert best_sy < 4.5, f"sym chain {best_sy:.2f} ms (> 4.5)"
        deltas = sorted(s - d for s, d in zip(sy_ms, de_ms))
        med = (deltas[(len(deltas) - 1) // 2] + deltas[len(deltas) // 2]) / 2
        # expected win ≈ (1−frac)·dense ≈ −3.0 ms; require ≥35% of it so
        # per-rep jitter (±0.4 ms observed) can't false-fail, while a
        # full-traffic fallback (delta ≈ 0) fails by ~3×the margin
        win = 0.35 * (1 - frac) * 18 * pass_ms
        assert med <= -win, (
            f"sym kernel lost its traffic win: median per-rep delta "
            f"{med:+.3f} ms vs required ≤ {-win:.3f} (sym {sy_ms}, "
            f"dense {de_ms})"
        )

    def test_multiround_sym_cached_headline_gate(self):
        """The round-5 HEADLINE backend (bench.py: symmetric multiround
        with the VMEM-resident tile cache, tile=512, auto cache budget):
        the cached chain must beat the pure-streaming sym chain by a real
        margin, compared via PER-REP deltas (both arms inside each rep so
        chip-state drift cancels), plus an absolute sanity bound.

        Measured (scratch/exp_sym_cached.py, 2026-08-20, slow-state
        session): cached C104 1.30–1.50 ms vs stream 3.51–3.54 ms —
        win ≈ −2.1 ms.  The gate requires ≥ 1.0 ms of it (per-rep jitter
        ±0.4 ms can't false-fail) — a regression that silently re-streams
        the cached tiles (the only way this backend fails while staying
        correct) reads delta ≈ 0 and fails by ~2× the margin.  The
        absolute bound 2.6 ms sits between the cached and stream regimes
        in every observed chip state."""
        import time as _time

        import jax.numpy as jnp
        from jax import lax

        from eigen_value_tpu.config import EPS, MAX_ITR
        from eigen_value_tpu.ops.pallas.kernels import (
            sym_auto_cache_tiles,
            sym_tile,
        )
        from eigen_value_tpu.ops.solver_matvec import solve_multiround

        tpu = _tpu()
        H = jax.device_put(np.asarray(fixtures.hilbert_matrix(self.DIM)), tpu)
        chunk = fixtures.HILBERT_ROUNDS[self.DIM] + 1
        tile = 512
        cache = sym_auto_cache_tiles(self.DIM, sym_tile(self.DIM, tile))

        def chain(k, tiles):
            @jax.jit
            def run(H):
                def body(i, acc):
                    s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
                    ev0 = jnp.ones((self.DIM,), jnp.float32) * s
                    return solve_multiround(
                        H, EPS, MAX_ITR, chunk=chunk, ev0=ev0,
                        symmetric=True, tile=tile, cache_tiles=tiles,
                    ).eigenvalue

                return lax.fori_loop(0, k, body, jnp.float32(0.0))

            return run

        ca_long, ca_short = chain(9, cache), chain(1, cache)
        st_long, st_short = chain(9, 0), chain(1, 0)
        for f in (ca_long, ca_short, st_long, st_short):
            float(np.asarray(f(H)))  # compile + warm

        ca_ms, st_ms = [], []
        for _ in range(7):
            t0 = _time.perf_counter()
            float(np.asarray(ca_long(H)))
            tl = (_time.perf_counter() - t0) * 1e3
            t0 = _time.perf_counter()
            float(np.asarray(ca_short(H)))
            ts = (_time.perf_counter() - t0) * 1e3
            ca_ms.append((tl - ts) / 8)
            t0 = _time.perf_counter()
            float(np.asarray(st_long(H)))
            tl = (_time.perf_counter() - t0) * 1e3
            t0 = _time.perf_counter()
            float(np.asarray(st_short(H)))
            ts = (_time.perf_counter() - t0) * 1e3
            st_ms.append((tl - ts) / 8)
        best_ca = min(ca_ms)
        assert best_ca < 2.6, (
            f"cached sym chain {best_ca:.2f} ms (> 2.6) — cache regression "
            f"(cached {ca_ms}, stream {st_ms})"
        )
        deltas = sorted(c - s for c, s in zip(ca_ms, st_ms))
        med = (deltas[(len(deltas) - 1) // 2] + deltas[len(deltas) // 2]) / 2
        assert med <= -1.0, (
            f"VMEM cache lost its win: median per-rep delta {med:+.3f} ms "
            f"vs required ≤ -1.0 (cached {ca_ms}, stream {st_ms})"
        )

    def test_bf16_fast_mode_perf_gate(self):
        """bf16 storage halves HBM bytes: its pass marginal must stay
        ≤ 65% of the SAME-RUN f32 marginal (measured ~51%; a silent
        upcast or layout regression reads ~100%) and the bf16 headline
        chain must stay under 4.8 ms (recorded best 3.27 via the
        multiround storage path, headline quick run 2026-08-20;
        slow-state floor ~3.2 for the 18 half-byte passes).  VERDICT r2
        item 6."""
        import time as _time

        import jax.numpy as jnp
        from jax import lax

        from eigen_value_tpu.config import EPS, MAX_ITR
        from eigen_value_tpu.device import matvec_blocks
        from eigen_value_tpu.ops.pallas import kernels
        from eigen_value_tpu.ops.solver_matvec import solve_matvec_storage
        from eigen_value_tpu.utils.timing import time_marginal

        tpu = _tpu()
        br, bc = matvec_blocks(self.DIM)
        H = jax.device_put(np.asarray(fixtures.hilbert_matrix(self.DIM)), tpu)
        Hb = jax.block_until_ready(H.astype(jnp.bfloat16))
        x = jax.device_put(np.ones(self.DIM, np.float32), tpu)

        def f32_step(i, s):
            Hi, xi = s
            return (Hi, kernels.matvec(Hi, xi, block_rows=br, block_cols=bc))

        def bf16_step(i, s):
            Hi, xi = s
            y = jnp.dot(
                Hi, xi.astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )
            return (Hi, y * jnp.float32(1e-3))  # keep magnitudes bounded

        f32_ms = time_marginal(f32_step, (H, x), k=64)
        bf16_ms = time_marginal(bf16_step, (Hb, x), k=64)
        assert bf16_ms <= 0.65 * f32_ms, (
            f"bf16 pass {bf16_ms * 1e3:.0f} us vs f32 {f32_ms * 1e3:.0f} us "
            f"— the half-bytes fast mode regressed"
        )

        def chain(k):
            @jax.jit
            def run(Hb):
                def body(i, acc):
                    s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
                    ev0 = jnp.ones((self.DIM,), jnp.float32) * s
                    return solve_matvec_storage(
                        Hb, EPS, MAX_ITR, storage_dtype=jnp.bfloat16, ev0=ev0
                    ).eigenvalue

                return lax.fori_loop(0, k, body, jnp.float32(0.0))

            return run

        long, short = chain(9), chain(1)
        float(np.asarray(long(Hb)))
        float(np.asarray(short(Hb)))
        best = float("inf")
        for _ in range(5):
            t0 = _time.perf_counter()
            float(np.asarray(long(Hb)))
            tl = (_time.perf_counter() - t0) * 1e3
            t0 = _time.perf_counter()
            float(np.asarray(short(Hb)))
            ts = (_time.perf_counter() - t0) * 1e3
            best = min(best, (tl - ts) / 8)
        assert best < 4.8, f"bf16 headline chain {best:.2f} ms/solve (> 4.8)"

    def test_drift_suite_on_hardware(self):
        """`--suite drift` must produce sane hardware rows: at least one
        NON-SUSPECT window with the matvec marginal inside the chip's
        known state envelope (745–930 GB/s, widened to 500–1200).
        Transport artifacts (marked suspect by the suite: jitter-inflated
        fast outliers, observed 1465 GB/s; stalls from a concurrent
        tunnel client, observed 0.14 GB/s) are excluded — they are a
        transport property, not a kernel regression.  All-suspect runs
        SKIP rather than fail: that's an unusable transport, and the
        kernel itself is still gated by the roofline/headline tests."""
        from eigen_value_tpu.bench.suite import bench_drift

        rows = bench_drift(dim=4096, windows=2, gap_s=1.0, k=32)
        timeline = [r for r in rows if r["bench"] == "drift"]
        assert len(timeline) == 2
        clean = [r for r in timeline if not r["suspect"] and r["gbps"]]
        if not clean:
            pytest.skip("every window suspect — transport too unstable to gate")
        for r in clean:
            assert 500 < r["gbps"] < 1200, (
                f"window {r['window']}: {r['gbps']} GB/s outside the "
                f"chip's plausible envelope"
            )
        assert rows[-1]["bench"] == "drift_summary"
