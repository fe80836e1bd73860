"""Public API tests: EigenValue class shape + functional entry."""

import numpy as np
import pytest

from eigen_value_tpu import (
    EigenValue,
    SolverConfig,
    max_eigenvalue,
    max_eigenvalue_batch,
)
from eigen_value_tpu.api import pick_block, resolve_backend


def test_eigenvalue_class_return_shape(rng):
    ev = EigenValue()
    mat = rng.random((256, 256), dtype=np.float32)
    lam, vec, ts_ms, rounds = ev.similarity_transform(mat)
    assert np.isscalar(lam) or lam.shape == ()
    assert vec.shape == (256,)
    assert ts_ms > 0
    assert isinstance(rounds, int) and 0 <= rounds <= 1000
    assert np.allclose(mat @ vec, lam * vec, atol=1e-3)


def test_compile_cache_reused(rng):
    ev = EigenValue()
    mat = rng.random((128, 128), dtype=np.float32)
    ev.similarity_transform(mat)
    n_compiled = len(ev._compiled)
    ev.similarity_transform(mat)
    assert len(ev._compiled) == n_compiled


def test_rejects_non_square(rng):
    """Both entries raise a descriptive ValueError (review r5c: the
    class API used a bare assert — gone under python -O — and crashed
    with a context-free unpack error on non-2D input)."""
    with pytest.raises(ValueError, match="square matrix"):
        EigenValue().similarity_transform(rng.random((4, 8), dtype=np.float32))
    with pytest.raises(ValueError, match="square matrix"):
        EigenValue().similarity_transform(np.ones((4, 4, 4), np.float32))
    with pytest.raises(ValueError, match="square matrix"):
        max_eigenvalue(rng.random((4, 8), dtype=np.float32))


def test_max_eigenvalue_functional(rng):
    mat = rng.random((128, 128), dtype=np.float32)
    res = max_eigenvalue(mat)
    assert bool(res.converged)
    assert np.allclose(
        mat @ np.asarray(res.eigenvector),
        float(res.eigenvalue) * np.asarray(res.eigenvector),
        atol=1e-3,
    )


def test_validate_rejects_nonpositive(rng):
    m = rng.random((16, 16), dtype=np.float32)
    m[3, 5] = -1.0
    with pytest.raises(ValueError, match="entries > 0"):
        max_eigenvalue(m, validate=True)
    # without validate the check is skipped (jittable path): the same
    # nonpositive matrix must NOT raise (result is unchecked garbage —
    # that's the documented contract)
    max_eigenvalue(m)
    # and a positive matrix passes validation
    max_eigenvalue(np.abs(m) + 1e-3, validate=True)


def test_max_eigenvalue_batch(rng):
    mats = rng.random((3, 64, 64), dtype=np.float32) + 1e-4
    res = max_eigenvalue_batch(mats)
    assert res.eigenvalue.shape == (3,)
    for b in range(3):
        v = np.asarray(res.eigenvector[b])
        assert np.allclose(mats[b] @ v, float(res.eigenvalue[b]) * v, atol=1e-3)


def test_warmup_precompiles(rng):
    ev = EigenValue()
    ev.warmup([64, 128])
    assert len(ev._compiled) == 2
    ev.similarity_transform(rng.random((64, 64), dtype=np.float32))
    assert len(ev._compiled) == 2  # cache hit, no new compile


def test_bf16_storage_config(rng):
    cfg = SolverConfig(backend="matvec", storage_dtype="bfloat16")
    mat = rng.random((128, 128), dtype=np.float32) + 1e-3
    res = max_eigenvalue(mat, cfg)
    v = np.asarray(res.eigenvector)
    lam = float(res.eigenvalue)
    # bf16 storage: ~1e-3 RELATIVE accuracy (λ ≈ 64 here, so scale atol)
    assert np.allclose(mat @ v, lam * v, atol=2e-3 * lam)
    want = max_eigenvalue(mat)  # f32 reference
    assert abs(lam - float(want.eigenvalue)) < 2e-3 * lam


def test_pick_block():
    assert pick_block(8192, 256) == 256
    assert pick_block(384, 256) == 128
    assert pick_block(128, 512) == 128
    assert pick_block(3, 256) is None


def test_backend_resolution():
    cfg = SolverConfig(backend="auto")
    # 3×3 anchor must fall back to the unaligned jnp matvec path
    assert resolve_backend(cfg, 3) == "matvec"
    assert resolve_backend(SolverConfig(backend="xla"), 8192) == "xla"
    assert resolve_backend(SolverConfig(backend="pallas"), 8192) == "pallas"


def test_auto_backend_nonpow2_aligned_dims(rng):
    """128-aligned dims NOT divisible by the default 256/512 blocks (384,
    640, ...) must route through matvec_pallas with an adapted tile shape
    instead of crashing on the kernel's divisibility assert."""
    mat = rng.random((384, 384), dtype=np.float32) + 1e-4
    # pin the routing itself: if auto stopped resolving to the Pallas
    # backend here, the adapted-tile path would silently go untested
    assert (
        resolve_backend(SolverConfig(backend="auto", interpret=True), 384)
        == "matvec_pallas"
    )
    res = max_eigenvalue(mat, SolverConfig(backend="auto", interpret=True))
    ref = max_eigenvalue(mat, SolverConfig(backend="matvec"))
    assert int(res.rounds) == int(ref.rounds)
    assert float(res.eigenvalue) == pytest.approx(float(ref.eigenvalue), abs=1e-3)
    v = np.asarray(res.eigenvector)
    assert np.allclose(mat @ v, float(res.eigenvalue) * v, atol=1e-3)


def test_resolve_backend_honors_pinned_device_platform():
    """A pinned device's platform must drive backend resolution — not the
    global default platform (regression: TPU-default host + CPU-pinned
    EigenValue picked matvec_pallas with interpret=False and failed)."""
    import types

    cfg = SolverConfig(backend="auto")
    tpu = types.SimpleNamespace(platform="tpu")
    cpu = types.SimpleNamespace(platform="cpu")
    assert resolve_backend(cfg, 256, device=tpu) == "matvec_pallas"
    assert resolve_backend(cfg, 256, device=cpu) == "matvec"


def test_auto_picks_multiround_at_hbm_resident_dims():
    """VERDICT r3 item 4: the headline-winning backend must be the
    default at the flagship dim.  Auto routes to multiround on a real
    TPU at n ≥ MULTIROUND_MIN_DIM (6144, the measured VMEM-residency
    cliff — the while-loop backend keeps A resident through 5120² and
    ties multiround at 6144²: docs/bench/boundary_r5.txt), to
    matvec_pallas below it, and NEVER under interpret mode (the
    boundary is a hardware property)."""
    import types

    from eigen_value_tpu.api import MULTIROUND_MIN_DIM

    cfg = SolverConfig(backend="auto")
    tpu = types.SimpleNamespace(platform="tpu")
    cpu = types.SimpleNamespace(platform="cpu")
    assert MULTIROUND_MIN_DIM == 6144
    assert resolve_backend(cfg, 8192, device=tpu) == "multiround"
    assert resolve_backend(cfg, 6144, device=tpu) == "multiround"
    assert resolve_backend(cfg, 16384, device=tpu) == "multiround"
    assert resolve_backend(cfg, 4096, device=tpu) == "matvec_pallas"
    assert resolve_backend(cfg, 5120, device=tpu) == "matvec_pallas"
    # unaligned dims above the boundary still fall back to jnp
    assert resolve_backend(cfg, 8192 + 64, device=tpu) == "matvec"
    # interpret mode (CI sanitizer) keeps the single-round kernel — ON
    # TPU TOO (review round 4: on_tpu + interpret=True slipped through
    # to multiround, whose HBM-scale grid is pathological to interpret)
    assert (
        resolve_backend(SolverConfig(backend="auto", interpret=True), 8192,
                        device=cpu)
        == "matvec_pallas"
    )
    assert (
        resolve_backend(SolverConfig(backend="auto", interpret=True), 8192,
                        device=tpu)
        == "matvec_pallas"
    )
    # explicit backend always wins over the auto policy
    assert (
        resolve_backend(SolverConfig(backend="matvec_pallas"), 8192, device=tpu)
        == "matvec_pallas"
    )


def test_validate_promotes_symmetric_to_sym_kernel(monkeypatch, rng):
    """VERDICT r4 item 1: once validate=True has paid for the on-device
    symmetry check at the multiround dims, a bitwise-symmetric matrix
    routes to the upper-triangle headline kernel (bench.py's backend)
    instead of checking and discarding the answer.  The boundary is
    shrunk so the promotion is exercised on the CPU suite (the real
    8192² boundary is asserted by test_auto_picks_multiround...)."""
    import jax.numpy as jnp

    import eigen_value_tpu.api as api_mod
    from eigen_value_tpu import fixtures

    seen = {}
    orig = api_mod._solve_fn

    def spy(config, backend, n=None, device=None):
        seen["symmetric"] = config.symmetric
        seen["backend"] = backend
        return orig(config, backend, n, device)

    monkeypatch.setattr(api_mod, "_solve_fn", spy)
    monkeypatch.setattr(api_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(api_mod, "MULTIROUND_MIN_DIM", 256)

    H = fixtures.hilbert_matrix(256)  # symmetric by construction
    res = api_mod.max_eigenvalue(H, validate=True)
    assert seen["backend"] == "multiround"
    assert seen["symmetric"] is True
    assert int(res.rounds) == fixtures.HILBERT_ROUNDS[256]
    assert bool(res.converged)

    # a positive but NON-symmetric matrix at the same dim is not promoted
    A = np.asarray(H).copy()
    A[0, 1] *= 2.0
    res_ns = api_mod.max_eigenvalue(jnp.asarray(A), validate=True)
    assert seen["symmetric"] is False
    assert bool(res_ns.converged)

    # without validate there is no device check, hence no promotion (a
    # wrong silent guess would compute a wrong answer)
    api_mod.max_eigenvalue(H)
    assert seen["symmetric"] is False

    # an explicit backend choice is authoritative — no promotion
    api_mod.max_eigenvalue(
        H, config=SolverConfig(backend="matvec"), validate=True
    )
    assert seen["backend"] == "matvec"
    assert seen["symmetric"] is False


def test_storage_dtype_with_non_storage_backend_raises():
    """storage_dtype + an iterated backend (xla/pallas) is a contradictory
    config: those solvers mutate A and cannot honor the reduced-precision
    storage contract (an all-bf16 iteration can't represent the 1e-3 stop
    tolerance).  Silently running full-f32 misled memory budgeting — the
    API now refuses instead."""
    import jax.numpy as jnp
    import pytest

    from eigen_value_tpu import fixtures, max_eigenvalue

    Hq = fixtures.hilbert_matrix(128, dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="matvec-family"):
        max_eigenvalue(Hq, SolverConfig(backend="xla", storage_dtype=jnp.bfloat16))
    # the default auto backend resolves to a matvec family and honors it
    res = max_eigenvalue(Hq, SolverConfig(storage_dtype=jnp.bfloat16))
    assert bool(res.converged)
    assert res.eigenvalue.dtype == jnp.float32
    assert int(res.rounds) <= fixtures.HILBERT_ROUNDS[128] + 1


def test_max_eigenvalue_batch_prequantized_no_f32_copy():
    """A batch already in storage_dtype must be solved as-is (the f32
    round-trip would double memory at exactly the scale the fast mode
    exists for)."""
    import jax.numpy as jnp

    from eigen_value_tpu import fixtures, max_eigenvalue_batch

    Hq = fixtures.hilbert_matrix(128, dtype=jnp.bfloat16)
    mats = jnp.stack([Hq, Hq * jnp.bfloat16(2.0)])
    res = max_eigenvalue_batch(mats, SolverConfig(storage_dtype=jnp.bfloat16))
    assert res.eigenvalue.shape == (2,)
    assert bool(jnp.all(res.converged))
    # λ(2A) = 2λ(A): the scaled copy really was solved independently
    ratio = float(res.eigenvalue[1] / res.eigenvalue[0])
    assert abs(ratio - 2.0) < 0.05


def test_float64_without_x64_raises():
    import jax
    import numpy as np_

    if jax.config.jax_enable_x64:
        pytest.skip("x64 enabled in this environment")
    with pytest.raises(ValueError, match="x64"):
        SolverConfig(dtype=np_.float64)


def test_max_eigenvalue_with_mesh():
    """The functional API routes to the sharded solver when given a mesh."""
    import jax
    from jax.sharding import Mesh

    from eigen_value_tpu import fixtures

    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("rows",))
    H = fixtures.hilbert_matrix(256)
    got = max_eigenvalue(H, mesh=mesh)
    assert bool(got.converged)
    assert int(got.rounds) == fixtures.HILBERT_ROUNDS[256]
    want = max_eigenvalue(H)
    assert abs(float(got.eigenvalue) - float(want.eigenvalue)) < 1e-4


def test_ts_ms_is_rtt_corrected(rng):
    """ts_ms estimates DEVICE time: the per-call launch latency (measured
    once per instance with a trivial executable) is subtracted from the
    wall clock (VERDICT r1 item 6 — the reference times only the device
    loop, similarity_transform.cpp:36-58)."""
    from eigen_value_tpu.api import EigenValue

    ev = EigenValue()
    mat = rng.random((256, 256), dtype=np.float32) + 0.5
    lam, vec, ts_ms, rounds = ev.similarity_transform(mat)
    # the subtracted launch latency is a real measured wall time of a
    # trivial executable: strictly positive (a regression to 0.0 would
    # silently turn ts_ms back into the uncorrected wall clock)
    assert ev._rtt_ms is not None and ev._rtt_ms > 0.0
    assert ev.last_wall_ms is not None
    assert ts_ms <= ev.last_wall_ms
    assert ts_ms == pytest.approx(max(ev.last_wall_ms - ev._rtt_ms, 0.0))


def test_eigen_residual_helper(rng):
    """eigen_residual = the reference wrapper test's acceptance check
    (wrapper/python/test.py:15-16) as a public jittable helper."""
    import jax

    from eigen_value_tpu import eigen_residual, max_eigenvalue

    import jax.numpy as jnp

    mat = jnp.asarray(rng.random((128, 128), dtype=np.float32) + 1e-2)
    res = max_eigenvalue(mat)
    r = float(eigen_residual(mat, res))
    assert r < 1e-3
    # jittable (fusion may round the last ulps differently)
    r2 = float(jax.jit(eigen_residual)(mat, res))
    assert r2 == pytest.approx(r, abs=1e-5)
    # sharded inputs compose via GSPMD
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("rows",))
    ms = jax.device_put(mat, NamedSharding(mesh, P("rows", None)))
    from eigen_value_tpu.parallel import solve_sharded_matvec

    res_s = solve_sharded_matvec(ms, mesh)
    assert float(eigen_residual(ms, res_s)) < 1e-3


def test_concurrent_similarity_transform_threads(rng, monkeypatch):
    """Serving contract: concurrent calls on one instance are correct and
    compile each (shape, dtype, backend) exactly once (guarded cache —
    counted via a wrapped _solve_fn, since the dict would show one entry
    even if every thread had compiled and overwritten it)."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from eigen_value_tpu import api

    calls = []
    real = api._solve_fn

    def counting_solve_fn(*a, **kw):
        calls.append(threading.get_ident())
        return real(*a, **kw)

    monkeypatch.setattr(api, "_solve_fn", counting_solve_fn)
    ev = EigenValue()
    mats = [rng.random((96, 96), dtype=np.float32) + 1e-3 for _ in range(8)]
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(ev.similarity_transform, mats))
    assert len(calls) == 1  # exactly one build+compile across 8 racers
    assert len(ev._compiled) == 1
    for mat, (lam, vec, ts, rounds) in zip(mats, results):
        assert np.allclose(mat @ vec, lam * vec, atol=1e-3)


def test_public_export_surface():
    """Every name in __all__ resolves, and the two passively-used
    exports hold their contracts: DEFAULT_CONFIG is the reference-
    constant SolverConfig (EPS/MAX_ITR exactly the reference's
    similarity_transform.hpp:4-5 values) and SolveResult is the
    4-field namedtuple every solver returns."""
    import eigen_value_tpu as evt

    for name in evt.__all__:
        assert getattr(evt, name) is not None, name
    assert evt.DEFAULT_CONFIG == evt.SolverConfig()
    assert evt.DEFAULT_CONFIG.eps == evt.EPS == 1e-3
    assert evt.DEFAULT_CONFIG.max_itr == evt.MAX_ITR == 1000
    assert evt.SolveResult._fields == (
        "eigenvalue", "eigenvector", "rounds", "converged",
    )


def test_zero_block_sizes_rejected():
    """Explicit block_rows=0 / block_cols=0 used to pass the modulo
    validation (0 % k == 0) and then be silently reinterpreted as the
    defaults by `or` fallbacks — the exact silent-drop class the config
    contract forbids (review r5c)."""
    with pytest.raises(ValueError, match="block_rows"):
        SolverConfig(block_rows=0)
    with pytest.raises(ValueError, match="block_cols"):
        SolverConfig(block_cols=0)


def test_class_api_prequantized_no_upcast(rng):
    """The class API honors the storage_dtype no-f32-copy contract like
    the functional path (review r5c: it used to cast a prequantized
    matrix to f32 first — 2× peak memory at storage scale)."""
    import jax.numpy as jnp

    cfg = SolverConfig(backend="matvec", storage_dtype="bfloat16")
    mat = rng.random((128, 128), dtype=np.float32) + 1e-3
    pre = jnp.asarray(mat).astype(jnp.bfloat16)
    ev = EigenValue(cfg)
    lam, v, _, itr = ev.similarity_transform(pre)
    want = max_eigenvalue(pre, cfg)  # the functional prequantized path
    assert float(lam) == float(want.eigenvalue)
    assert itr == int(want.rounds)
    # the compile cache must have been keyed on the STORAGE dtype (proof
    # the f32 cast never happened)
    assert any(k[1] == "bfloat16" for k in ev._compiled)
