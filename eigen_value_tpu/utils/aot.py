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


# ---------------------------------------------------------------------------
# Shippable AOT artifacts (jax.export / StableHLO)
#
# The closest TPU-native analog of the reference's AOT *binaries*
# (``make aot_cpu`` builds a spir64_x86_64 executable you can ship,
# reference Makefile:44-58): a serialized, versioned StableHLO program a
# serving process loads and calls with ZERO Python-side tracing or
# compile-time solver code — only jax + the artifact bytes.  Artifacts can
# be cross-lowered (e.g. a TPU+CPU artifact produced on a CPU-only build
# machine), mirroring how the reference cross-compiles AOT targets for
# devices the build host lacks.
# ---------------------------------------------------------------------------

_SERIALIZATION_REGISTERED = False


def _register_solve_result() -> None:
    """Register SolveResult for jax.export serialization (idempotent)."""
    global _SERIALIZATION_REGISTERED
    if _SERIALIZATION_REGISTERED:
        return
    from jax import export as jexport

    from ..ops.solver import SolveResult

    jexport.register_namedtuple_serialization(
        SolveResult, serialized_name="eigen_value_tpu.SolveResult"
    )
    _SERIALIZATION_REGISTERED = True


def export_solver(n: int, config=None, platforms=None):
    """AOT-export the dim-``n`` solver as a ``jax.export.Exported``.

    ``platforms`` (e.g. ``("tpu", "cpu")``) cross-lowers for devices the
    exporting host need not have; default is the host's platform.  The
    artifact pins shape (n, n), dtype, eps/max_itr, and the backend —
    the same things the reference bakes into its AOT binary.  Serialize
    with :func:`save_exported`; a server calls
    ``load_exported(path).call(A)`` and gets the usual ``SolveResult``.

    Interpret-mode Pallas cannot be serialized (it runs through a Python
    callback); export Pallas backends with ``config.interpret=False`` (the
    compiled TPU path) or use the jnp backends.
    """
    from jax import export as jexport

    from ..api import _solve_fn, resolve_backend
    from ..config import DEFAULT_CONFIG

    config = config or DEFAULT_CONFIG
    _register_solve_result()
    backend = resolve_backend(config, n)
    fn = _solve_fn(config, backend, n)
    jf = jax.jit(lambda A: fn(A))
    args = jax.ShapeDtypeStruct((n, n), config.dtype)
    plats = list(platforms) if platforms is not None else None
    return jexport.export(jf, platforms=plats)(args)


def export_sharded_solver(
    n: int,
    mesh,
    config=None,
    axis_name: str = "rows",
    platforms=None,
    use_pallas=None,
):
    """AOT-export the row-partitioned multi-chip solve for ``mesh``.

    The artifact embeds the sharding layout (``exported.nr_devices`` =
    mesh size); a serving process with an identically-shaped mesh loads
    it and calls with an A sharded ``P(axis_name, None)`` — the
    multi-chip serving analog of :func:`export_solver`.

    ``platforms`` cross-lowers like :func:`export_solver`.  One caveat:
    the local-matvec implementation choice (``use_pallas``, default:
    auto-detected from the MESH's devices) must suit the TARGET platform
    — when cross-lowering for a platform the mesh's devices don't have,
    pass ``use_pallas=False`` (the jnp local matvec, correct and
    near-roofline everywhere; the auto-detection would otherwise bake
    the exporting host's choice, including interpret-mode Pallas, which
    cannot be serialized).
    """
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import DEFAULT_CONFIG
    from ..parallel.sharded import solve_sharded_matvec

    config = config or DEFAULT_CONFIG
    _register_solve_result()
    jf = jax.jit(
        lambda A: solve_sharded_matvec(
            A, mesh, axis_name=axis_name, config=config, use_pallas=use_pallas
        )
    )
    sharding = NamedSharding(mesh, P(axis_name, None))
    arg = jax.ShapeDtypeStruct((n, n), config.dtype, sharding=sharding)
    plats = list(platforms) if platforms is not None else None
    return jexport.export(jf, platforms=plats)(arg)


def save_exported(exported, path: str) -> str:
    """Write a serialized export artifact; returns ``path``."""
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_exported(path: str):
    """Load an artifact written by :func:`save_exported`.  Call it with
    ``.call(A)`` — runs the embedded program for the current platform.

    ``call`` lowers for the platform the call EXECUTES on (the committed
    device of ``A``, else the process default device) and raises if that
    platform is not among ``exported.platforms``.  When the default
    device differs from the artifact's target (e.g. a CPU-defaulted
    process serving a tpu-only artifact), ``jax.device_put`` the input
    onto the target device first — or export with both platforms."""
    from jax import export as jexport

    _register_solve_result()
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
