"""Public Python API.

Mirrors the shape of the reference's Python wrapper
(``wrapper/python/similarity_transform.py:18-78``): an ``EigenValue`` class
whose ``similarity_transform(mat)`` returns ``(λ, v, ts_ms, rounds)``.  The
reference's constructor loads a shared object and builds a SYCL queue; the
TPU-native equivalent of that one-time setup is JIT compilation, which this
class caches per (shape, dtype, backend), and the returned ``ts_ms``
subtracts the measured per-call launch latency of the transport — so timed
calls estimate device execution only, the same thing the reference times
(its clock starts after buffer setup, ``similarity_transform.cpp:36``).

Also exposes the functional entry :func:`max_eigenvalue` returning the
:class:`SolveResult` pytree, which is the idiomatic JAX surface (composable
with jit/vmap/shard_map).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DEFAULT_CONFIG, SolverConfig
from .device import matvec_blocks, on_tpu as _on_tpu
from .device import pick_block, resolve_interpret
from .ops.solver import SolveResult, solve_xla


#: Auto-routing boundary for the multiround backend, placed from the
#: round-5 boundary sweep (docs/bench/boundary_r5.txt, one process,
#: 2026-08-20): the matvec-pallas while-loop keeps A VMEM-RESIDENT
#: through 5120² (100 MiB < the 128 MiB VMEM: 0.60 ms vs multiround's
#: 2.72) and falls off the residency cliff at 6144² (144 MiB: 3.57 ms
#: vs multiround's 3.60 — a ~1% tie), after which multiround wins
#: outright (7168²: 4.87 vs 5.04; 8192²: 6.45 vs 6.57).  6144 is the
#: smallest measured dim past the cliff; the dense tie there is noise,
#: and for declared/validated-symmetric inputs the same boundary is a
#: 1.7× win (sym 2.05 ms at 6144²), so one constant serves both.
MULTIROUND_MIN_DIM = 6144


def resolve_backend(
    config: SolverConfig, n: int, device: Optional[jax.Device] = None
) -> str:
    """Resolve "auto" to a concrete backend for a dim-n solve.

    "auto" prefers the matvec (power-form) solver — algebraically the same
    iteration with 3× less HBM traffic per round than the reference's
    structure (see solver_matvec.py) — with its Pallas kernel when the dim
    is tile-aligned on TPU, falling back to jnp everywhere else.  On a
    REAL TPU past the VMEM-residency cliff (n ≥ MULTIROUND_MIN_DIM) it
    picks the multi-round kernel — the same backend bench.py's headline
    measures (VERDICT r3 item 4; the policy mirrors the reference
    wrapper's "defaults pick the fast path" wg_size rule,
    wrapper/similarity_transform.cpp:24-33) — and for DECLARED-symmetric
    inputs it picks it at every sym-tileable TPU dim (the VMEM-cached
    triangle kernel wins at every measured dim, e2e_sweep_r5.jsonl).
    Interpret mode never routes to multiround: interpreting an
    HBM-scale multi-round grid is pathologically slow and the boundary
    is a hardware property.

    OVERSHOOT CAVEAT (config.py `chunk` notes): the auto default
    chunk=18 is the exact fit for the benchmark family's 17-round
    flagship solve; an input converging much earlier still streams the
    remainder of its final chunk (frozen compute, real DMA — up to
    chunk−1 wasted O(n²) passes).  For workloads with known small round
    counts at these dims, set ``chunk ≈ rounds + 1`` or force
    ``backend="matvec_pallas"`` (which wastes nothing but pays a
    per-round restart).

    ``device`` (when the solve is pinned, e.g. ``EigenValue(device=...)``)
    overrides the default-platform check: the backend must match where
    the computation actually runs, not the global default.
    """
    if config.backend != "auto":
        return config.backend
    if pick_block(n, config.block_rows or 128) is None:
        return "matvec"  # unaligned dims (e.g. the 3×3 anchor): jnp matvec
    on_tpu = device.platform == "tpu" if device is not None else _on_tpu()
    # not config.interpret: forcing interpret mode (the CI sanitizer)
    # must never route to an HBM-scale multi-round grid — see the
    # docstring's invariant (found as a hole in review: on_tpu +
    # interpret=True used to slip through to multiround)
    if on_tpu and not config.interpret:
        if n >= MULTIROUND_MIN_DIM:
            return "multiround"
        if config.symmetric:
            # declared-symmetric inputs take the cached triangle kernel
            # at EVERY sym-tileable dim: with the VMEM cache it beats
            # the while-loop backends at every measured dim, including
            # the VMEM-resident ones (e2e_sweep_r5.jsonl: 0.344 vs
            # 0.691 ms at 4096², 0.018 vs 0.070 at 512²)
            from .ops.pallas.kernels import sym_tile

            if sym_tile(n, config.block_rows or 512) is not None:
                return "multiround"
    if on_tpu or config.interpret:
        return "matvec_pallas"
    return "matvec"


def _resolve_blocks(
    config: SolverConfig, n: Optional[int], backend: str = "matvec_pallas"
) -> Tuple[int, int]:
    """Pallas tile shape for a dim-n solve.

    Defaults are the measured-best shapes per backend — FULL-ROW stripes
    for the matvec kernel when they fit the VMEM budget (contiguous HBM
    reads; device.matvec_blocks), 512×1024 for the fused scale+rowsum
    kernel (tile sweep at 8192²: 762 vs 705 GB/s for the old 256×512);
    explicit config values win.  When ``n`` is known, blocks shrink to the
    largest aligned divisors (384, 640, ... are 128-aligned but not
    divisible by the defaults)."""
    if (
        config.block_rows is None
        and config.block_cols is None
        and n is not None
        and backend.startswith("matvec")
    ):
        mb = matvec_blocks(n)
        if mb is not None:
            return mb
    rows = config.block_rows or 512
    cols = config.block_cols or (512 if backend.startswith("matvec") else 1024)
    if n is None:
        return rows, cols
    return (pick_block(n, rows) or rows, pick_block(n, cols) or cols)


def _cache_unalignable(cache_tiles, n, tile, consequence: str) -> ValueError:
    """The honored-or-rejected error for an explicit cache request at a
    dim/tile with no 128-aligned square divisor (shared by the symmetric
    fallback and the dense explicit-cache branches)."""
    return ValueError(
        f"cache_tiles={cache_tiles} needs a 128-aligned square tile that "
        f"divides n={n} (kernels.sym_tile(n, {tile}) is None — "
        f"{'raise block_rows to >= 128' if tile < 128 else 'this dim has no such divisor'}); "
        f"{consequence}. Drop cache_tiles or adjust block_rows."
    )


def _solve_fn(
    config: SolverConfig,
    backend: str,
    n: Optional[int] = None,
    device: Optional[jax.Device] = None,
):
    """Build the solve callable for ``backend``; ``n`` (when known) adapts
    the Pallas tile shape to the dim so every 128-aligned dim works;
    ``device`` (when pinned) decides the Pallas interpret default.

    CONFIG CONSISTENCY CONTRACT (VERDICT r3 item 3): every SolverConfig
    knob is either honored by the resolved backend or rejected with a
    ValueError — never silently dropped (silent drops are how the
    round-2 Kronecker-class failures hid).  The one sanctioned nuance:
    ``interpret`` and the block sizes also FEED ``resolve_backend``'s
    auto routing, so under ``backend="auto"`` they are consumed by the
    resolution itself (e.g. interpret=True routes to matvec_pallas for
    aligned dims; for unaligned dims the jnp fallback has no kernel to
    interpret and the knob is vacuous by construction, not dropped).
    With an EXPLICIT non-Pallas backend they raise.
    """
    if config.storage_dtype is not None and backend in ("xla", "pallas"):
        raise ValueError(
            f"storage_dtype={config.storage_dtype} requires a matvec-family "
            f"backend (the reduced-precision storage contract lives in "
            f"solver_matvec.py); got backend={backend!r}. Use backend='auto' "
            f"or 'matvec'/'matvec_pallas'."
        )
    if config.eps_mode != "absolute" and backend == "pallas":
        raise ValueError(
            "eps_mode='relative' is not supported by the iterated-Pallas "
            "backend (its fused kernel bakes the absolute stop); use the "
            "matvec family or 'xla'"
        )
    if config.chunk is not None and backend != "multiround":
        raise ValueError(
            f"chunk={config.chunk} is a multiround-backend knob (rounds per "
            f"Pallas invocation) but the {'resolved' if config.backend == 'auto' else 'requested'} "
            f"backend is {backend!r} — it would be silently dropped. Use "
            f"backend='multiround' (or drop chunk)."
        )
    if config.cache_tiles is not None and backend != "multiround":
        raise ValueError(
            f"cache_tiles={config.cache_tiles} is a multiround-backend knob "
            f"(the VMEM-resident tile cache, ops/pallas/kernels."
            f"multiround_sym) but the "
            f"{'resolved' if config.backend == 'auto' else 'requested'} "
            f"backend is {backend!r} — it would be silently dropped. Use "
            f"backend='multiround' (or drop cache_tiles)."
        )
    if config.symmetric and backend != "multiround" and config.backend != "auto":
        # Under "auto" the declaration is consumed by the resolution (the
        # dense backends win below the HBM-residency boundary and results
        # are identical — config.symmetric docs); an EXPLICIT other
        # backend has no symmetric form, so the knob would be a silent drop.
        raise ValueError(
            f"symmetric=True is implemented by the multiround backend only "
            f"(the upper-triangle kernel, ops/pallas/kernels.multiround_sym); "
            f"backend={config.backend!r} would silently stream the full "
            f"matrix. Use backend='multiround' or 'auto'."
        )
    explicit_non_pallas = config.backend in ("xla", "matvec")
    if explicit_non_pallas:
        if config.block_rows is not None or config.block_cols is not None:
            raise ValueError(
                f"block_rows/block_cols are Pallas tile knobs; backend="
                f"{config.backend!r} runs no Pallas kernel, so they would "
                f"be silently dropped"
            )
        if config.interpret is not None:
            raise ValueError(
                f"interpret is a Pallas-mode knob; backend={config.backend!r} "
                f"runs no Pallas kernel, so it would be silently dropped"
            )
    if config.storage_dtype is not None and backend in ("matvec", "matvec_pallas"):
        if config.block_rows is not None or config.block_cols is not None:
            raise ValueError(
                "block_rows/block_cols don't apply to the reduced-precision "
                "storage path (it uses the XLA gemv, measured at the bf16 "
                "roofline — solver_matvec.solve_matvec_storage); they would "
                "be silently dropped"
            )
        if config.interpret is not None:
            raise ValueError(
                "interpret doesn't apply to the reduced-precision storage "
                "path (the XLA gemv runs no Pallas kernel — "
                "solver_matvec.solve_matvec_storage); it would be silently "
                "dropped. The multiround backend honors storage_dtype AND "
                "interpret together."
            )
    block_rows, block_cols = _resolve_blocks(config, n, backend)
    if backend == "pallas":
        from .ops.solver_pallas import solve_pallas

        return partial(
            solve_pallas,
            eps=config.eps,
            max_itr=config.max_itr,
            block_rows=block_rows,
            block_cols=block_cols,
            interpret=resolve_interpret(config.interpret, device),
        )
    if backend in ("matvec", "matvec_pallas") and config.storage_dtype is not None:
        from .ops.solver_matvec import solve_matvec_storage

        return partial(
            solve_matvec_storage,
            eps=config.eps,
            max_itr=config.max_itr,
            storage_dtype=config.storage_dtype,
            eps_mode=config.eps_mode,
        )
    if backend == "multiround":
        if config.block_cols is not None:
            raise ValueError(
                "the multiround kernel streams full-width row stripes "
                "(no column tiling — its round state lives in VMEM "
                "scratch, ops/pallas/kernels.multiround); block_cols="
                f"{config.block_cols} would be silently dropped. Set "
                "block_rows to size the stripes, or drop block_cols."
            )
        from .ops.solver_matvec import solve_multiround

        from .ops.pallas.kernels import sym_auto_cache_tiles, sym_tile

        def _auto_cache(bt: int, sym: bool = True) -> int:
            # VMEM-resident tile cache (round 5): defaults pick the fast
            # path — None auto-sizes to the measured-safe budget (104
            # MiB f32 / 48 MiB bf16, kernels.sym_auto_cache_tiles; the
            # cacheable-tile cap differs between the triangle and the
            # dense tiled kernel), so the API's multiround solves match
            # bench.py's headline configuration; explicit values (incl.
            # 0 = streaming) win.
            if config.cache_tiles is not None:
                return config.cache_tiles
            itemsize = (
                jnp.dtype(config.storage_dtype).itemsize
                if config.storage_dtype is not None
                else 4
            )
            return sym_auto_cache_tiles(
                n, bt, itemsize, 48 if itemsize == 2 else 104, sym=sym
            )

        kw = {}
        tile = config.block_rows or 512
        bt = sym_tile(n, tile) if n is not None else None
        if config.symmetric:
            if config.backend == "auto" and n is not None and bt is None:
                # auto consumed the declaration but the dim admits no
                # 128-aligned square tile — the dense multiround kernel
                # keeps the job (identical results, full traffic).  An
                # EXPLICIT cache request cannot ride along silently
                # though (the honored-or-rejected contract — review r5):
                # the stripes fallback has no cache.
                if config.cache_tiles:
                    raise _cache_unalignable(
                        config.cache_tiles, n, tile,
                        "the cache-less stripes fallback would silently "
                        "drop it",
                    )
                if config.block_rows is not None:
                    kw["block_rows"] = config.block_rows
            else:
                # block_rows doubles as the square tile edge here (the
                # triangle kernel has no rectangular stripes); explicit
                # values are honored, 512 is the measured default
                kw["symmetric"] = True
                kw["tile"] = tile
                if bt is not None:
                    kw["cache_tiles"] = _auto_cache(bt)
        elif config.cache_tiles:
            # EXPLICIT dense cache request: the tiled direct-terms kernel
            # (block_rows, if set, is its square tile edge); a dim/tile
            # with no 128-aligned square divisor cannot be served and
            # must not silently run the cache-less stripes kernel
            # (the honored-or-rejected contract)
            if bt is None and n is not None:
                raise _cache_unalignable(
                    config.cache_tiles, n, tile,
                    "the stripes kernel would silently run without the "
                    "cache",
                )
            kw["tile"] = tile
            kw["cache_tiles"] = config.cache_tiles
        elif (
            config.cache_tiles is None
            and config.block_rows is None
            and bt is not None
            and _auto_cache(bt, sym=False) > 0
        ):
            # DENSE + auto cache (round 5): the tiled direct-terms kernel
            # with the resident cache beats the stripes kernel at the
            # multiround dims (4.00 vs 6.36 ms at 8192² —
            # scratch/exp_dense_cached.py).  Only when block_rows is
            # unset: an explicit block_rows keeps its established stripes
            # meaning (stripe height, advisor r3) rather than being
            # silently reinterpreted as a tile edge.  cache_tiles=0 and
            # unalignable dims keep the stripes kernel too.
            kw["tile"] = tile
            kw["cache_tiles"] = _auto_cache(bt, sym=False)
        elif config.block_rows is not None:
            # honor an explicitly configured stripe height (advisor r3:
            # it was silently dropped for this backend only); the kernel
            # default (256) is the measured-best otherwise.
            kw["block_rows"] = config.block_rows
        return partial(
            solve_multiround,
            eps=config.eps,
            max_itr=config.max_itr,
            chunk=config.chunk or 18,
            interpret=resolve_interpret(config.interpret, device),
            eps_mode=config.eps_mode,
            storage_dtype=config.storage_dtype,
            **kw,
        )
    if backend == "matvec_pallas":
        from .ops.solver_matvec import solve_matvec_pallas

        return partial(
            solve_matvec_pallas,
            eps=config.eps,
            max_itr=config.max_itr,
            block_rows=block_rows,
            block_cols=block_cols,
            interpret=resolve_interpret(config.interpret, device),
            eps_mode=config.eps_mode,
        )
    if backend == "matvec":
        from .ops.solver_matvec import solve_matvec

        return partial(
            solve_matvec,
            eps=config.eps,
            max_itr=config.max_itr,
            eps_mode=config.eps_mode,
        )
    return partial(
        solve_xla, eps=config.eps, max_itr=config.max_itr, eps_mode=config.eps_mode
    )


def max_eigenvalue(
    mat: jax.Array,
    config: SolverConfig = DEFAULT_CONFIG,
    validate: bool = False,
    mesh=None,
) -> SolveResult:
    """Maximum eigenvalue + eigenvector of a positive square matrix.

    Functional entry point; jittable (with ``validate=False``).  ``mat``
    must be square with all entries > 0 (the method's correctness
    precondition — SURVEY.md §0: the reference's reductions seed their
    accumulators with 0 and silently return garbage on non-positive input;
    pass ``validate=True`` to check on device and raise instead).

    ``validate=True`` also PROMOTES to the symmetric fast path when it
    applies: under ``backend="auto"`` at the multiround dims, a matrix
    that checks bitwise symmetric on device is solved by the
    upper-triangle headline kernel (identical semantics, ~0.53× the HBM
    traffic — the same backend ``bench.py`` measures), so
    ``max_eigenvalue(H, validate=True)`` matches the headline timing
    without an explicit ``SolverConfig(symmetric=True)`` declaration.

    ``mesh`` (a ``jax.sharding.Mesh`` with a ``"rows"`` axis) runs the
    row-partitioned multi-chip solve instead of the single-chip one —
    the one-argument door to `parallel/` (solve_sharded_matvec; use the
    parallel module directly for the ring/batched variants).  A mesh with
    BOTH ``"rows"`` and ``"cols"`` axes dispatches to the 2D block-sharded
    solve (per-chip memory n²/(pr·pc), parallel/sharded.py).  On the mesh
    path ``backend`` maps to the sharded body with the same structure —
    "auto"/"matvec_pallas"/"matvec" pick the matvec-form solve (Pallas
    local matvec auto/on/off), "xla" the iterated (mutate-A) solve — and
    single-chip-only backends ("pallas", "multiround") raise;
    ``eps_mode`` is honored by every sharded body.
    """
    mat = jnp.asarray(mat)
    if mat.ndim != 2 or mat.shape[0] != mat.shape[1]:
        raise ValueError(f"must be a square matrix, got shape {mat.shape}")
    if mesh is not None:
        from .parallel.sharded import (
            solve_sharded,
            solve_sharded_2d,
            solve_sharded_matvec,
        )

        # Config consistency (VERDICT r3 item 3): every knob is honored
        # or rejected — the mesh path used to silently ignore ``backend``
        # (e.g. "multiround") and rejected eps_mode wholesale.  eps_mode
        # is now threaded through every sharded solver; backends map to
        # the sharded bodies that implement the same structure, and the
        # unmappable ones raise.
        _reject_unsupported(
            config,
            "the mesh path",
            (
                ("block_rows", config.block_rows is None,
                 "the sharded Pallas path sizes its own tiles per shard "
                 "(parallel/sharded.py local_matvec)"),
                ("block_cols", config.block_cols is None,
                 "the sharded Pallas path sizes its own tiles per shard "
                 "(parallel/sharded.py local_matvec)"),
                ("chunk", config.chunk is None,
                 "the multiround kernel is single-chip only"),
                ("cache_tiles", config.cache_tiles is None,
                 "the VMEM-resident tile cache is a single-chip "
                 "multiround feature (one chip's VMEM holds the tiles)"),
                ("interpret", config.interpret is None,
                 "interpret auto-resolves from the mesh's platform (CPU "
                 "meshes interpret, TPU meshes compile)"),
            ),
        )
        if config.symmetric:
            raise ValueError(
                "symmetric=True has no sharded form (the upper-triangle "
                "kernel is single-chip — its round state lives in one "
                "chip's VMEM scratch; the sharded solvers stream full row "
                "blocks); it would be silently dropped. Solve single-chip "
                "or drop the declaration."
            )
        is_2d = "cols" in mesh.shape
        use_pallas = None
        if config.backend == "multiround":
            raise ValueError(
                "backend='multiround' is single-chip only (its round "
                "state lives in one chip's VMEM scratch); the mesh path "
                "would silently ignore it. Use backend='auto' for the "
                "sharded solvers, or solve single-chip."
            )
        if config.backend == "pallas":
            raise ValueError(
                "backend='pallas' (the iterated fused kernel) has no "
                "sharded form; use backend='auto' (matvec-form sharded "
                "solve) or 'xla' (iterated sharded solve)"
            )
        if is_2d and config.backend not in ("auto", "matvec"):
            raise ValueError(
                f"backend={config.backend!r} has no 2D block-sharded "
                "form (solve_sharded_2d runs the matvec-form XLA body); "
                "use backend='auto' or 'matvec'"
            )
        if config.backend == "matvec":
            use_pallas = False
        elif config.backend == "matvec_pallas":
            use_pallas = True

        # honor storage_dtype exactly like the single-chip path: a matrix
        # already in storage_dtype is solved as-is (no f32 copy is made)
        if not (
            config.storage_dtype is not None
            and mat.dtype == jnp.dtype(config.storage_dtype)
        ):
            mat = mat.astype(config.dtype)
        if validate and not bool(jnp.all(mat > 0)):
            raise ValueError("similarity-transform method requires all entries > 0")
        if is_2d:
            if "rows" not in mesh.shape:
                raise ValueError(
                    "a mesh with a 'cols' axis needs a 'rows' axis too "
                    "(size 1 for pure column sharding) — got axes "
                    f"{tuple(mesh.shape)}; build it with "
                    "parallel.make_mesh2d(1, pc)"
                )
            return solve_sharded_2d(mat, mesh, config=config)
        if config.backend == "xla":
            # the iterated (mutate-A) sharded body — the sharded analog of
            # the single-chip "xla" rung
            if config.storage_dtype is not None:
                raise ValueError(
                    "storage_dtype requires a matvec-family backend on the "
                    "mesh path too (the iterated sharded body mutates A "
                    "and cannot honor the storage contract)"
                )
            return solve_sharded(mat, mesh, config=config)
        return solve_sharded_matvec(mat, mesh, config=config, use_pallas=use_pallas)
    # The backend must match where the computation will actually run: a
    # COMMITTED single-device input (jax.device_put) executes there
    # regardless of the default platform, so resolve against its device
    # (review r5c; the class API has always passed its pinned device the
    # same way).  Uncommitted inputs keep the default-platform routing.
    dev = None
    if getattr(mat, "committed", False):
        devs = list(mat.devices())
        if len(devs) == 1:
            dev = devs[0]
    backend = resolve_backend(config, mat.shape[0], dev)
    prequantized = (
        config.storage_dtype is not None
        and mat.dtype == jnp.dtype(config.storage_dtype)
        and backend in ("matvec", "matvec_pallas", "multiround")
    )
    if not prequantized:  # storage path accepts its own dtype — no f32 copy
        mat = mat.astype(config.dtype)
    if validate:
        # Defaults pick the fast path (VERDICT r4 item 1, mirroring the
        # reference wrapper's wg_size policy,
        # wrapper/similarity_transform.cpp:24-33): once validate=True has
        # paid for an on-device structure check anyway, a bitwise-
        # symmetric matrix is routed to the cached upper-triangle
        # headline kernel (bench.py's backend — it wins at every
        # sym-tileable TPU dim, e2e_sweep_r5.jsonl) instead of checking
        # and discarding the answer.  The candidate is RESOLVED first —
        # including sym-tileability at the candidate's tile — so the
        # O(n²) symmetry check only runs where the sym route would
        # actually be TAKEN (not where _solve_fn would fall back to the
        # dense stripes kernel).  Auto-only: an explicit backend choice
        # is authoritative, and without validate the declaration must
        # come from the caller (SolverConfig(symmetric=True)) because a
        # wrong guess computes a wrong answer.
        cand = None
        if not config.symmetric and config.backend == "auto":
            from dataclasses import replace

            from .ops.pallas.kernels import sym_tile

            c = replace(config, symmetric=True)
            if (
                resolve_backend(c, mat.shape[0], dev) == "multiround"
                and sym_tile(mat.shape[0], c.block_rows or 512) is not None
            ):
                cand = c
        check_sym = config.symmetric or cand is not None
        pos, sym_ok = _validate_on_device(mat, check_sym)
        if not bool(pos):
            raise ValueError(
                "similarity-transform method requires all entries > 0"
            )
        if config.symmetric and not bool(sym_ok):
            # the declaration is a promise (BLAS-symv semantics); checked
            # on device only when asked — bitwise, because the triangle
            # kernel substitutes A[i,j] for A[j,i] exactly
            raise ValueError(
                "symmetric=True declared but the matrix is not bitwise "
                "symmetric (mat != mat.T); the upper-triangle kernel would "
                "compute a wrong answer"
            )
        if cand is not None and bool(sym_ok):
            config, backend = cand, "multiround"
    return _solve_fn(config, backend, mat.shape[0], dev)(mat)


@partial(jax.jit, static_argnames=("check_sym",))
def _validate_on_device(mat: jax.Array, check_sym: bool):
    """``validate=True``'s O(n²) structure checks — positivity and
    (when routing wants it) bitwise symmetry — in ONE dispatch so the
    tunneled transport pays ONE ~30 ms launch round trip, not two
    (review r5c: the split checks wrapped a ~6 ms flagship solve in
    ~60 ms of validation overhead)."""
    pos = jnp.all(mat > 0)
    sym = jnp.all(mat == mat.T) if check_sym else jnp.asarray(False)
    return pos, sym


def eigen_residual(mat: jax.Array, result: SolveResult) -> jax.Array:
    """``max |A·v − λ·v|`` — the eigen-pair acceptance check of the
    reference's wrapper test (``wrapper/python/test.py:15-16``, atol 1e-3)
    as a jittable one-liner.

    Works on sharded inputs unchanged: with a row-sharded ``mat`` and the
    sharded result's eigenvector, GSPMD partitions the matvec and inserts
    the gather (this is how the multi-host worker validates its global
    solve, bench/mh_worker.py)."""
    v = result.eigenvector
    return jnp.max(jnp.abs(mat @ v - result.eigenvalue * v))


def _reject_unsupported(config: SolverConfig, entry: str, checks) -> None:
    """Raise on config knobs ``entry`` cannot honor (the honored-or-
    rejected contract, VERDICT r3 item 3).  ``checks`` is an iterable of
    ``(knob, is_default, why)``."""
    for knob, is_default, why in checks:
        if not is_default:
            raise ValueError(
                f"{knob}={getattr(config, knob)!r} is not supported by "
                f"{entry} — {why}; it would be silently dropped"
            )


def max_eigenvalue_batch(
    mats: jax.Array, config: SolverConfig = DEFAULT_CONFIG, mesh=None
) -> SolveResult:
    """Batched solves over ``mats`` of shape (B, n, n); result leaves carry
    a leading batch axis with per-matrix round counts (see
    parallel/batched.py for the masked-loop semantics).

    ``mesh`` mirrors :func:`max_eigenvalue`'s one-argument door to
    `parallel/`: a mesh with a ``"batch"`` axis shards the batch (DP-like,
    solve_batched_sharded); a mesh with BOTH ``"batch"`` and ``"rows"``
    axes also shards each matrix's rows (DP×TP composition,
    solve_batched_rowsharded — BASELINE config 4's layout).

    Honors eps / max_itr / dtype / eps_mode / storage_dtype; the batched
    bodies are the vmapped matvec-form solver, so any other backend
    choice (and the Pallas tile knobs) is rejected rather than silently
    dropped.
    """
    from .parallel.batched import solve_batched

    _reject_unsupported(
        config,
        "max_eigenvalue_batch",
        (
            ("backend", config.backend in ("auto", "matvec"),
             "the batched body is the vmapped matvec-form solver "
             "(parallel/batched.py); under vmap the hot op is a batched "
             "gemv and the Pallas/multiround kernels have no batched form"),
            ("block_rows", config.block_rows is None,
             "the batched body runs no Pallas kernel"),
            ("block_cols", config.block_cols is None,
             "the batched body runs no Pallas kernel"),
            ("chunk", config.chunk is None,
             "the multiround kernel has no batched form"),
            ("cache_tiles", config.cache_tiles is None,
             "the VMEM tile cache is a multiround feature; the batched "
             "body runs no Pallas kernel"),
            ("interpret", config.interpret is None,
             "the batched body runs no Pallas kernel"),
            ("symmetric", not config.symmetric,
             "the upper-triangle kernel has no batched form; the batched "
             "gemv streams full matrices"),
        ),
    )
    mats = jnp.asarray(mats)
    # honor storage_dtype exactly like the single-chip and mesh paths: a
    # batch already in storage_dtype is solved as-is — materializing a
    # transient f32 copy would double memory at exactly the scale the
    # reduced-precision mode exists for
    if not (
        config.storage_dtype is not None
        and mats.dtype == jnp.dtype(config.storage_dtype)
    ):
        mats = mats.astype(config.dtype)
    if mesh is not None:
        if "batch" not in mesh.shape:
            raise ValueError(
                f"a batched mesh needs a 'batch' axis — got axes "
                f"{tuple(mesh.shape)}; build it with "
                "Mesh(devs, ('batch',)) or make_mesh2d(pb, pr, 'batch', 'rows')"
            )
        if "rows" in mesh.shape:
            from .parallel.sharded import solve_batched_rowsharded

            return solve_batched_rowsharded(mats, mesh, config=config)
        from .parallel.batched import solve_batched_sharded

        return solve_batched_sharded(mats, mesh, config=config)
    return solve_batched(
        mats,
        config.eps,
        config.max_itr,
        storage_dtype=config.storage_dtype,
        eps_mode=config.eps_mode,
    )


def max_eigenvalue_operator(
    matvec, n: int, config: SolverConfig = DEFAULT_CONFIG
) -> SolveResult:
    """Matrix-free solve: ``matvec(x) -> A @ x`` for an implicit positive
    operator that is never materialized (structured matrices with fast
    matvecs, operator sums/products, matrices too large to store).  See
    :func:`eigen_value_tpu.ops.solver_matvec.solve_operator` for the
    semantics and the round-count caveat.  Traced — jittable as-is.

    λ-SCALE LIMIT of the default stop: the reference-exact ``eps_mode=
    "absolute"`` compares adjacent row sums against a RAW eps=1e-3 while
    the row sums converge to λ — f32 matvec rounding noise scales with
    λ·n, so for operators with λ ≳ 10³ (e.g. Kronecker products of
    unnormalized factors: λ = λ_B·λ_C) the check may never fire and the
    solve exhausts ``max_itr`` (``converged=False``).  For such operators
    pass ``config=SolverConfig(eps_mode="relative")`` (tol = eps·max|v|,
    scale-invariant) or pre-scale with
    :func:`~eigen_value_tpu.ops.structured.scale_matvec` (λ scales by
    exactly α).  The reference never hits this: its only workload has
    λ ≈ 2.6 (similarity_transform.hpp:4 semantics preserved as default).

    Honors eps / max_itr / dtype / eps_mode; a matrix-free solve observes
    A only through ``matvec``, so the dense-backend knobs (backend,
    blocks, chunk, interpret, storage_dtype) are rejected rather than
    silently dropped — precision/storage of the operator's internals
    belongs to the caller's ``matvec``.
    """
    from .ops.solver_matvec import solve_operator

    _reject_unsupported(
        config,
        "max_eigenvalue_operator",
        (
            ("backend", config.backend in ("auto", "matvec"),
             "a matrix-free solve IS the matvec-form loop; dense backends "
             "don't apply"),
            ("storage_dtype", config.storage_dtype is None,
             "the operator is never materialized — reduced-precision "
             "storage belongs inside the caller's matvec"),
            ("block_rows", config.block_rows is None,
             "no Pallas kernel runs on the operator path"),
            ("block_cols", config.block_cols is None,
             "no Pallas kernel runs on the operator path"),
            ("chunk", config.chunk is None,
             "the multiround kernel needs a materialized matrix"),
            ("cache_tiles", config.cache_tiles is None,
             "the VMEM tile cache needs a materialized matrix"),
            ("interpret", config.interpret is None,
             "no Pallas kernel runs on the operator path"),
            ("symmetric", not config.symmetric,
             "a matrix-free solve observes A only through matvec — "
             "exploiting symmetry belongs inside the caller's matvec"),
        ),
    )
    return solve_operator(
        matvec,
        n,
        config.eps,
        config.max_itr,
        dtype=config.dtype,
        eps_mode=config.eps_mode,
    )


class EigenValue:
    """Class-shaped API with the reference wrapper's return convention.

    ``similarity_transform(mat) -> (eigenvalue, eigenvector, ts_ms, rounds)``
    exactly as ``wrapper/python/similarity_transform.py:42-78`` — except
    ``ts_ms`` is a float (the reference truncates to whole ms) and inputs of
    any float dtype are accepted (cast to ``config.dtype``; the reference
    hard-asserts float32).

    ``ts_ms`` is an RTT-CORRECTED device-time ESTIMATE: the reference's
    clock brackets only the device loop (similarity_transform.cpp:36-58),
    but on a tunneled/remote device a naive wall clock would include a
    fixed per-call launch latency that can exceed the solve itself (~30 ms
    vs ~6 ms at 8192² on the axon transport).  The launch latency is
    measured once per instance with a trivial executable and subtracted;
    the uncorrected wall time of the last call is kept in
    ``last_wall_ms``.

    PRECISION CAVEAT (this is the single-call exception the measurement
    rules in CLAUDE.md call out): a per-call estimate necessarily carries
    the transport's per-launch JITTER (~±1.5 ms on the tunnel — ~25% of
    an 8192² solve, and more than the whole device time at small dims,
    where the value may clamp to 0.0).  It matches the reference API's
    best-effort per-call semantics; for numbers you can compare or
    regress on, use chained differencing (bench.py) or marginal chains
    (utils/timing.py), which cancel both the latency and its jitter.

    THREAD SAFETY: the compilation cache is guarded, so concurrent
    ``similarity_transform`` calls on one instance compute correctly and
    compile each (shape, dtype, backend) once — but ``ts_ms`` /
    ``last_wall_ms`` are per-instance fields and interleave under
    concurrency.  For per-call timings in a threaded server, use one
    instance per thread (solves themselves serialize on a single device
    anyway).
    """

    def __init__(
        self,
        config: SolverConfig = DEFAULT_CONFIG,
        device: Optional[jax.Device] = None,
    ) -> None:
        """``device`` pins all solves to one device — the analog of the
        reference's SYCL device selection at queue construction
        (wrapper/similarity_transform.cpp:4-12, default_selector in
        main.cpp:10).  None = the platform default."""
        import threading

        self.config = config
        self.device = device
        self._compiled = {}
        self._compile_lock = threading.Lock()
        self._rtt_ms: Optional[float] = None
        self.last_wall_ms: Optional[float] = None

    def _launch_rtt_ms(self, reps: int = 5) -> float:
        """Fixed per-call launch latency of this device/transport: best-of
        ``reps`` wall time of a trivial compiled call (its device time is
        ~ns, so the wall IS the launch overhead)."""
        if self._rtt_ms is None:
            with self._compile_lock:
                if self._rtt_ms is not None:
                    return self._rtt_ms
                self._rtt_ms = self._measure_launch_ms(reps)
        return self._rtt_ms

    def _measure_launch_ms(self, reps: int) -> float:
        # Called under _compile_lock: concurrent first calls would each
        # measure, and a probe timed while another thread's solve occupies
        # the device records queueing delay as launch latency — the last
        # writer would then skew every later ts_ms.
        x = jnp.zeros((), jnp.float32)
        if self.device is not None:
            x = jax.device_put(x, self.device)
        fn = jax.jit(lambda t: t + 1.0).lower(x).compile()
        jax.block_until_ready(fn(x))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            best = min(best, (time.perf_counter() - t0) * 1e3)
        return best

    def _get_compiled(self, n: int, dtype):
        backend = resolve_backend(self.config, n, self.device)
        key = (n, jnp.dtype(dtype).name, backend)
        fn = self._compiled.get(key)
        if fn is None:
            # lock so concurrent servers compile each key once (the race
            # would be correct but wastes a multi-second compile per racer)
            with self._compile_lock:
                fn = self._compiled.get(key)
                if fn is None:
                    solve = _solve_fn(self.config, backend, n, self.device)
                    aval = jax.ShapeDtypeStruct(
                        (n, n),
                        dtype,
                        sharding=(
                            jax.sharding.SingleDeviceSharding(self.device)
                            if self.device is not None
                            else None
                        ),
                    )
                    fn = jax.jit(solve).lower(aval).compile()
                    self._compiled[key] = fn
        return fn

    def warmup(self, dims, dtype=None) -> None:
        """Pre-compile the solver for the given dims (the AOT analog of the
        reference's aot_cpu/aot_gpu build targets, Makefile:44-64)."""
        dtype = dtype or self.config.dtype
        for n in dims:
            self._get_compiled(n, dtype)

    def similarity_transform(
        self, mat
    ) -> Tuple[np.float32, np.ndarray, float, int]:
        if self.device is not None and not isinstance(mat, jax.Array):
            # place host data directly on the pinned device — going through
            # jnp.asarray first would bounce the O(n²) payload off the
            # default device
            mat = jax.device_put(np.asarray(mat), self.device)
        mat = jnp.asarray(mat)
        if mat.ndim != 2 or mat.shape[0] != mat.shape[1]:
            raise ValueError(
                f"must be a square matrix of floating points, got shape "
                f"{mat.shape}"
            )
        n = mat.shape[0]
        # honor storage_dtype exactly like the functional path: a matrix
        # already in storage_dtype is solved as-is — the old unconditional
        # cast to config.dtype materialized a transient f32 copy (2× peak
        # memory at exactly the scale reduced-precision storage exists
        # for; review r5c)
        prequantized = (
            self.config.storage_dtype is not None
            and mat.dtype == jnp.dtype(self.config.storage_dtype)
            and resolve_backend(self.config, n, self.device)
            in ("matvec", "matvec_pallas", "multiround")
        )
        if not prequantized:
            mat = mat.astype(self.config.dtype)
        if self.device is not None:
            mat = jax.device_put(mat, self.device)  # no-op if already there
        fn = self._get_compiled(n, mat.dtype)

        rtt = self._launch_rtt_ms()  # measured BEFORE the timed call
        start = time.perf_counter()
        res = jax.block_until_ready(fn(mat))
        self.last_wall_ms = (time.perf_counter() - start) * 1e3
        ts_ms = max(self.last_wall_ms - rtt, 0.0)

        return (
            np.asarray(res.eigenvalue)[()],
            np.asarray(res.eigenvector),
            ts_ms,
            int(res.rounds),
        )
