"""Multi-device parallelism: row-sharded and batched solvers."""

from .batched import solve_batched, solve_batched_sharded
from .sharded import (
    make_row_mesh,
    solve_batched_rowsharded,
    solve_sharded,
    solve_sharded_matvec,
)

__all__ = [
    "solve_batched",
    "solve_batched_rowsharded",
    "solve_batched_sharded",
    "solve_sharded",
    "solve_sharded_matvec",
    "make_row_mesh",
]
