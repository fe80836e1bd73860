"""Pallas-backed single-chip solver: fused-kernel round body.

Same orchestration as :mod:`.solver` (identical loop semantics, SURVEY.md
§0) with the O(n²) passes replaced by the Pallas kernels: the pre-loop row
sums by :func:`..pallas.kernels.rowsum` and the per-round
update-and-resum by :func:`..pallas.kernels.scale_rowsum` (1 read + 1
write of A per round instead of the reference's 2 reads + 1 write —
BASELINE.md derived targets).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax

from ..device import auto_interpret as _auto_interpret
from .pallas import kernels
from .solver import SolveResult, solve_loop


@partial(
    jax.jit,
    static_argnames=("eps", "max_itr", "block_rows", "block_cols", "interpret"),
)
def solve_pallas(
    A: jax.Array,
    eps: float,
    max_itr: int,
    block_rows: int = 256,
    block_cols: int = 512,
    interpret: Optional[bool] = None,
    ev0: jax.Array | None = None,
) -> SolveResult:
    """Similarity-transform solve with the fused Pallas round body.

    ``ev0`` overrides the all-ones start vector (scale-invariant in ev;
    see :func:`..solver.solve_loop`)."""
    if interpret is None:
        interpret = _auto_interpret()
    kw = dict(block_rows=block_rows, block_cols=block_cols, interpret=interpret)
    return solve_loop(
        A,
        rowsum=partial(kernels.rowsum, **kw),
        scale_rowsum=partial(kernels.scale_rowsum, **kw),
        eps=eps,
        max_itr=max_itr,
        ev0=ev0,
    )
