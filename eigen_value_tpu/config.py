"""Solver configuration.

The reference keeps its two knobs as compile-time constants
(``EPS = 1e-3``, ``MAX_ITR = 1000`` — reference
``include/similarity_transform.hpp:4-5``) plus runtime args ``dim`` and
``wg_size``.  Here the same knobs live in a small frozen dataclass whose
defaults replicate the reference exactly; block sizes are the TPU analog of
``wg_size`` (Pallas tile shape instead of a SYCL work-group).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp

#: Convergence tolerance — reference include/similarity_transform.hpp:4.
EPS: float = 1e-3
#: Iteration cap — reference include/similarity_transform.hpp:5.
MAX_ITR: int = 1000


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """All knobs of the similarity-transform solver.

    CONSISTENCY CONTRACT: every public entry point (max_eigenvalue —
    single-chip and mesh — max_eigenvalue_batch, max_eigenvalue_operator,
    EigenValue) either HONORS a knob or REJECTS it with a ValueError;
    non-default knobs are never silently dropped (api.py).  ``interpret``
    and the block sizes additionally feed ``resolve_backend``'s auto
    routing, so under ``backend="auto"`` they are consumed by the
    resolution itself even when the resolved backend runs no Pallas
    kernel.  The low-level solvers (``parallel/``, ``ops/``) take the
    knobs they consume as explicit arguments instead — routing is the
    entry points' job.

    Attributes:
      eps: convergence tolerance on adjacent row-sum differences
        (wraparound neighborhood — reference similarity_transform.cpp:385-417).
      max_itr: iteration cap (reference include/similarity_transform.hpp:5).
      dtype: compute dtype. The reference device path is float32 throughout
        (include/similarity_transform.hpp:8-9); its sequential oracle is
        float64 (main.py NumPy default).
      backend: "auto" | "xla" | "pallas" | "matvec" | "matvec_pallas" |
        "multiround" —
        the optimization ladder (mirroring the reference's benchmark
        variants v0/v1/v2):
          * "xla": pure-jnp iterated round body (3 n² passes/round — the
            reference's structure, XLA-fused to ~2).
          * "pallas": hand-fused scale+row-sum kernel, mutates A in place
            (1 read + 1 write of A per round).
          * "matvec": power-form solver — one matvec against the ORIGINAL
            A per round (1 read, no writes; see solver_matvec.py).
          * "matvec_pallas": matvec form with the Pallas matvec kernel
            (≈ HBM roofline). THE production path for arbitrary inputs.
          * "multiround": up to ``chunk`` rounds per Pallas invocation
            (the bench.py headline path) — fastest once A exceeds the
            VMEM-residency cliff (f32 n ≥ 6144 on the 128 MiB v5e);
            below it the while-loop backends keep A resident in VMEM
            across rounds, which multiround's per-block streaming
            cannot (measured 0.60 vs 2.72 ms at 5120²).
        "auto" picks multiround on a real TPU for tile-aligned dims at or
        above the residency cliff (api.MULTIROUND_MIN_DIM = 6144, placed
        from the round-5 boundary sweep, docs/bench/boundary_r5.txt —
        the headline backend), matvec_pallas for other tile-aligned TPU
        dims, matvec otherwise.
      block_rows / block_cols: Pallas tile shape for the n² passes. These
        play the role of the reference's work-group size knob
        (wrapper/similarity_transform.cpp:24-33) but are chosen for
        VMEM/VPU tiling instead of SIMD width. ``None`` (default) picks
        the measured-best shape per backend: 512×1024 for the fused
        scale+rowsum kernel, 512×512 for the matvec kernel.
      interpret: force Pallas interpret mode (None = auto: interpret
        whenever not running on a real TPU). Interpret mode doubles as the
        CI "sanitizer" run (SURVEY.md §5).
    """

    eps: float = EPS
    max_itr: int = MAX_ITR
    #: Stop-tolerance semantics: "absolute" (reference-exact — its EPS is a
    #: raw threshold, similarity_transform.hpp:4) or "relative" (opt-in:
    #: tol = eps·max|v|, scale-invariant).  Absolute mode is silently
    #: unsound for operators with large λ: f32 row-sum rounding noise
    #: ~λ·n·2⁻²⁴ can exceed eps=1e-3 so the check never fires (see
    #: ops.solver.stop_check).  Relative mode changes round counts, so the
    #: parity tables only apply to the default.
    eps_mode: str = "absolute"
    dtype: Any = jnp.float32
    backend: str = "auto"
    block_rows: Optional[int] = None
    block_cols: Optional[int] = None
    interpret: Optional[bool] = None
    #: Optional reduced-precision MATRIX storage (e.g. jnp.bfloat16): halves
    #: HBM traffic per round on the matvec path; O(n) state stays float32.
    #: Accuracy loosens to ~2e-3 (see solver_matvec.solve_matvec_storage).
    storage_dtype: Optional[Any] = None
    #: Rounds per Pallas invocation for backend="multiround" (None = 18,
    #: the flagship family's 17 rounds + the initial row-sum pass).  Size
    #: it to the workload's expected round count + 1: convergence inside
    #: a chunk freezes compute but the remaining rounds' A blocks still
    #: stream, so oversize chunks waste DMA.  Semantics never change —
    #: the stop is checked every round regardless (solve_multiround).
    chunk: Optional[int] = None
    #: DECLARES the matrix symmetric (the caller's promise, like a BLAS
    #: ``symv`` — nothing is checked unless the entry point's ``validate``
    #: flag is set; a lie gives a wrong answer).  Implemented by the
    #: multiround backend: each round streams only the upper-triangle
    #: tiles of A — ~half the HBM traffic of the memory-bound solve
    #: (ops/pallas/kernels.multiround_sym).  A property DECLARATION, not a
    #: backend request: under backend="auto" the resolution consumes it —
    #: the triangle kernel is picked where it wins (real TPU, sym-tileable
    #: dim at/above the HBM-residency boundary) and the dense backends
    #: keep the job elsewhere (declaring symmetry never changes results,
    #: only traffic).  An EXPLICIT backend other than "multiround" rejects
    #: it (no symmetric form — it would be silently dropped).
    symmetric: bool = False
    #: VMEM-resident tile cache for the multiround backend (round 5):
    #: that many tiles of A live on chip across the whole solve,
    #: crossing HBM once per SOLVE instead of once per round
    #: (ops/pallas/kernels.multiround_sym cache_tiles — measured 1.30 ms
    #: vs 3.51 pure streaming at 8192² f32 symmetric, 4.00 vs 6.36
    #: dense).  None (default) auto-sizes to the measured-safe VMEM
    #: budget (kernels.sym_auto_cache_tiles: 104 MiB f32 / 48 MiB bf16);
    #: 0 disables caching.  A multiround-path knob — other explicit
    #: backends reject it (the honored-or-rejected contract).
    cache_tiles: Optional[int] = None

    def __post_init__(self) -> None:
        if self.backend not in (
            "auto", "xla", "pallas", "matvec", "matvec_pallas", "multiround"
        ):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.chunk is not None and self.chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {self.chunk}")
        if self.max_itr < 0:
            raise ValueError("max_itr must be >= 0")
        if self.eps <= 0:
            raise ValueError("eps must be > 0")
        if self.cache_tiles is not None and self.cache_tiles < 0:
            raise ValueError(
                f"cache_tiles must be >= 0, got {self.cache_tiles}"
            )
        if self.eps_mode not in ("absolute", "relative"):
            raise ValueError(
                f"eps_mode must be 'absolute' or 'relative', got {self.eps_mode!r}"
            )
        # Mosaic tiling constraints (pallas_guide): lane (last) dim blocks
        # must be multiples of 128, sublane (row) blocks multiples of 8.
        # Validate here so a bad explicit tile fails fast with a clear
        # message instead of a Mosaic lowering error at solve time.
        if self.block_cols is not None and (
            self.block_cols < 128 or self.block_cols % 128 != 0
        ):
            raise ValueError(
                f"block_cols must be a positive multiple of 128 (f32 lane "
                f"width), got {self.block_cols}"
            )
        if self.block_rows is not None and (
            self.block_rows < 8 or self.block_rows % 8 != 0
        ):
            raise ValueError(
                f"block_rows must be a positive multiple of 8 (f32 sublane "
                f"width), got {self.block_rows}"
            )
        if jnp.dtype(self.dtype) == jnp.dtype("float64"):
            import jax

            if not jax.config.jax_enable_x64:
                raise ValueError(
                    "dtype=float64 needs x64 mode (jax.config.update"
                    "('jax_enable_x64', True)); without it JAX silently "
                    "downcasts to float32"
                )


DEFAULT_CONFIG = SolverConfig()
