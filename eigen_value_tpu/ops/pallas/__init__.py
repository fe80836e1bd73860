"""Pallas TPU kernels for the O(n²) passes."""

from . import kernels

__all__ = ["kernels"]
