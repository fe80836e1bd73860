"""Device-platform detection, tile-size selection, and CPU hermeticity.

Single home for the decisions every backend shares:

  * *are we on a real TPU?* — drives both auto-backend routing (api.py)
    and the default for Pallas ``interpret`` mode (solver_pallas.py,
    bench suite).  Kept in one place so the two can never diverge.
  * *what Pallas tile divides this dim?* — the TPU analog of the
    reference's work-group-size policy (wrapper/similarity_transform.cpp:
    24-33 picks ``min(dim/2, device_max)``); here tiles must both respect
    the (8,128) f32 register tiling and exactly divide the array dims.
  * *how does CPU-only work avoid the remote-TPU tunnel?* — a tunneled
    accelerator plugin (registered by a sitecustomize hook) is initialized
    by jax on first backend use regardless of JAX_PLATFORMS, so CPU work
    hangs whenever the tunnel wedges unless the plugin is removed first
    (``unregister_remote_tpu_plugin`` in-process,
    ``hermetic_cpu_env`` for child interpreters).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

#: Name the tunneled-TPU PJRT plugin registers under, and the marker in
#: its sitecustomize directory's basename on PYTHONPATH.
_REMOTE_PLUGIN = "axon"


def unregister_remote_tpu_plugin() -> None:
    """Drop the tunneled-TPU backend factory from THIS interpreter's jax
    registry so no later backend init dials the tunnel.

    jax initializes every registered platform on first backend use even
    when ``jax_platforms`` excludes it, and the tunnel's wedge failure
    mode blocks that init inside a C call forever (utils/health.py).
    Call before any jax backend is touched, then set
    ``jax.config.update("jax_platforms", "cpu")`` — the env var may have
    been read into the config as the plugin's name at import time.
    ``_backend_factories`` is private jax API: acceptable because the
    image pins jax 0.9.0 and a changed internal degrades to a no-op
    (the default-device pin still applies).
    """
    try:
        from jax._src import xla_bridge

        xla_bridge._backend_factories.pop(_REMOTE_PLUGIN, None)
    except Exception:
        pass


def hermetic_cpu_env(base: Optional[dict] = None) -> dict:
    """A copy of ``base`` (default ``os.environ``) from which a FRESH
    interpreter cannot reach the remote-TPU tunnel: the plugin's
    sitecustomize dir is stripped from PYTHONPATH (a child re-runs
    sitecustomize, and JAX_PLATFORMS alone does not stop an
    already-registered plugin from initializing) and JAX_PLATFORMS is
    pinned to cpu.  Use for every subprocess that must work while the
    tunnel is wedged or busy (health CPU probes, CPU bench workers, the
    CPU test suite's children)."""
    env = dict(os.environ if base is None else base)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and _REMOTE_PLUGIN not in os.path.basename(p)
    )
    env["JAX_PLATFORMS"] = "cpu"
    return env


def on_tpu() -> bool:
    """True when computations default to a TPU device.

    Honors an explicit ``jax_default_device`` override (the test harness
    pins CPU this way because JAX_PLATFORMS is ignored under the tunnel).
    """
    d = jax.config.jax_default_device
    if d is not None:
        return getattr(d, "platform", str(d)) == "tpu"
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def auto_interpret() -> bool:
    """Interpret Pallas kernels whenever not running on a real TPU."""
    return not on_tpu()


def resolve_interpret(
    explicit: Optional[bool], device: Optional[jax.Device] = None
) -> bool:
    """The one place Pallas ``interpret`` defaults are decided: an explicit
    setting wins; a pinned device's platform comes next; otherwise the
    default platform (``auto_interpret``)."""
    if explicit is not None:
        return bool(explicit)
    if device is not None:
        return device.platform != "tpu"
    return auto_interpret()


def pick_block(n: int, preferred: int) -> Optional[int]:
    """Largest hardware-aligned tile size ≤ ``preferred`` dividing ``n``,
    or None if n is not 128-aligned (f32 lane width — see pallas_guide
    tiling constraints).  The alignment gate is on ``n`` itself: a
    ``preferred`` that happens to divide an unaligned n (e.g. 64 | 192)
    must still return None so callers fall back to the jnp path instead
    of handing Mosaic an unliftable lane dimension."""
    if n % 128 != 0:
        return None
    for b in (preferred, 1024, 512, 256, 128):
        if b <= preferred and n % b == 0:
            return b
    return None


#: Per-kernel double-buffered VMEM budget for full-row matvec tiles.
#: Mosaic's scoped-VMEM limit is 16 MiB on v5e (measured: a 2×16 MiB
#: allocation is rejected); 4 MiB of A-stripe per buffer leaves head-room
#: for the x/out operand buffers and was the measured-best shape at 8192²
#: (64×8192 → contiguous 2 MiB DMAs, see docs/BENCH_RESULTS.md round 2).
_MATVEC_VMEM_BUDGET = 4 << 20


def matvec_blocks(n: int, itemsize: int = 4) -> Optional[tuple]:
    """Best Pallas matvec tile for an n-column pass: FULL-ROW blocks
    (bc = n) when the double-buffered stripe fits the VMEM budget.

    Full rows make every A-block DMA one contiguous HBM range and collapse
    the column-block grid axis — no output-block revisits, no repeated x
    fetches (measured best-of-sweep at 8192²: 351 µs/pass vs 360 for
    512×512; the contiguous pattern also produced the best single
    observations on record, 321 µs).  Falls back to the 512×512 tiling for
    dims whose smallest row stripe exceeds the budget, and returns None
    for non-128-aligned dims (caller uses the jnp path)."""
    if n % 128 != 0:
        return None
    max_br = _MATVEC_VMEM_BUDGET // (2 * itemsize * n)
    for br in (512, 256, 128, 64, 32, 16, 8):
        if br <= max_br and n % br == 0:
            return br, n
    b = pick_block(n, 512)
    return (b, b) if b else None
