"""Benchmark harness (reference L4 equivalent: benchmarks/ + main.cpp)."""

from . import suite

__all__ = ["suite"]
