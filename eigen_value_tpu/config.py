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

    Attributes:
      eps: convergence tolerance on adjacent row-sum differences
        (wraparound neighborhood — reference similarity_transform.cpp:385-417).
      max_itr: iteration cap (reference include/similarity_transform.hpp:5).
      dtype: compute dtype. The reference device path is float32 throughout
        (include/similarity_transform.hpp:8-9); its sequential oracle is
        float64 (main.py NumPy default).
      backend: "auto" | "xla" | "pallas". "xla" is the pure-jnp round body
        (XLA fuses the O(n) ops into the O(n²) passes); "pallas" uses the
        hand-written fused scale+row-sum kernel (1 read + 1 write of A per
        round instead of the reference's 2 reads + 1 write). "auto" picks
        pallas on TPU for tile-aligned dims, else xla.
      block_rows / block_cols: Pallas tile shape for the n² passes. These
        play the role of the reference's work-group size knob
        (wrapper/similarity_transform.cpp:24-33) but are chosen for
        VMEM/VPU tiling instead of SIMD width.
      interpret: force Pallas interpret mode (None = auto: interpret
        whenever not running on a real TPU). Interpret mode doubles as the
        CI "sanitizer" run (SURVEY.md §5).
    """

    eps: float = EPS
    max_itr: int = MAX_ITR
    dtype: Any = jnp.float32
    backend: str = "auto"
    block_rows: int = 256
    block_cols: int = 512
    interpret: Optional[bool] = None

    def __post_init__(self) -> None:
        if self.backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.max_itr < 0:
            raise ValueError("max_itr must be >= 0")
        if self.eps <= 0:
            raise ValueError("eps must be > 0")


DEFAULT_CONFIG = SolverConfig()
