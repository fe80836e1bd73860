"""Ahead-of-time compilation utilities.

The reference ships AOT build targets (``make aot_cpu`` / ``aot_gpu``,
reference Makefile:44-64) so kernels are compiled once, not per run.  The
XLA analog has two halves:

  * per-process AOT: ``EigenValue.warmup`` / ``jax.jit(...).lower().compile()``
    (api.py) compiles for given shapes before the first timed call;
  * cross-process AOT: the persistent compilation cache below — compiled
    executables are written to disk and reloaded by later processes, so a
    production service pays each (shape, backend) compile exactly once per
    machine, like the reference's AOT'd binary.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/eigen_value_tpu/xla")


def enable_persistent_cache(path: Optional[str] = None) -> str:
    """Turn on XLA's on-disk compilation cache (idempotent).

    Returns the cache directory.  Thresholds are zeroed so even the small
    solver executables are cached (defaults skip sub-second compiles).
    """
    path = path or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def disable_persistent_cache() -> None:
    """Turn the on-disk compilation cache back off."""
    jax.config.update("jax_compilation_cache_dir", None)
