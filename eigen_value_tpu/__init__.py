"""eigen_value_tpu — TPU-native maximum-eigenvalue framework.

A brand-new JAX/XLA/Pallas implementation of the similarity-transform method
for the maximum eigenvalue and eigenvector of positive square matrices, with
the full capability surface of the reference SYCL library
(itzmeanjan/eigen_value): kernel pipeline, convergence semantics,
verification fixtures, benchmark harness, Python API — re-designed TPU-first
(fused Pallas kernels, on-device `lax.while_loop`, mesh sharding for
multi-chip, vmapped batched solves).
"""

from . import checkpoint, fixtures
from .api import (
    EigenValue,
    eigen_residual,
    max_eigenvalue,
    max_eigenvalue_batch,
    max_eigenvalue_operator,
)
from .config import DEFAULT_CONFIG, EPS, MAX_ITR, SolverConfig
from .ops.solver import SolveResult

__version__ = "0.1.0"

__all__ = [
    "EigenValue",
    "eigen_residual",
    "checkpoint",
    "fixtures",
    "max_eigenvalue",
    "max_eigenvalue_batch",
    "max_eigenvalue_operator",
    "SolverConfig",
    "SolveResult",
    "DEFAULT_CONFIG",
    "EPS",
    "MAX_ITR",
]
