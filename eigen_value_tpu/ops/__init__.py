"""Compute ops: the round-body passes and solver loop."""

from .solver import (
    SolveResult,
    rowsum_xla,
    scale_rowsum_xla,
    solve_loop,
    solve_xla,
    stop_check,
)

__all__ = [
    "SolveResult",
    "rowsum_xla",
    "scale_rowsum_xla",
    "solve_loop",
    "solve_xla",
    "stop_check",
]
