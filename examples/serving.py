"""Serving workflow: build a shippable solver artifact, probe device
health, load-and-solve with zero tracing.

The reference's production story was an AOT-compiled binary plus a
ctypes-loaded .so (Makefile:44-69, wrapper/python/similarity_transform.py);
the TPU-native analog is a serialized StableHLO artifact
(utils/aot.export_solver) that a serving process loads and calls without
any solver code being traced or compiled, plus the deadline-bounded
health probe a router consults before dispatching to a device.

Run: python examples/serving.py   (CPU-hermetic; artifacts for a real TPU
are built the same way with platforms=("tpu",) on any host)
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# This demo is CPU-only: keep it from initializing a (possibly wedged)
# remote-TPU plugin — the same hermeticity rule the test suite follows.
from eigen_value_tpu.device import unregister_remote_tpu_plugin

unregister_remote_tpu_plugin()

import tempfile

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from eigen_value_tpu import fixtures
from eigen_value_tpu.utils import aot, health


def main() -> None:
    n = 1024

    # ── build side: export a versioned artifact (any host) ─────────────
    # platforms=("tpu", "cpu") would cross-lower for a chip this build
    # machine does not have — exactly how the reference cross-compiles
    # its aot_gpu target on a CPU box.
    exported = aot.export_solver(n)
    with tempfile.TemporaryDirectory() as d:
        path = aot.save_exported(exported, f"{d}/solver_{n}.bin")
        size_kb = _os.path.getsize(path) / 1024
        print(f"artifact: solver_{n}.bin ({size_kb:.1f} KiB, platforms={exported.platforms})")

        # ── serving side: health-gate, then load and solve ─────────────
        rep = health.probe(deadline_s=60, device="cpu")
        print(f"health: alive={rep['alive']} rtt={rep['rtt_ms']} ms")
        assert rep["alive"], "route away from an unhealthy device"

        loaded = aot.load_exported(path)
        H = np.asarray(fixtures.hilbert_matrix(n))
        res = loaded.call(H)
        lam, rounds = float(res.eigenvalue), int(res.rounds)
        print(f"served solve: λ = {lam:.5f}, rounds = {rounds} "
              f"(expect {fixtures.HILBERT_ROUNDS[n]})")
        assert rounds == fixtures.HILBERT_ROUNDS[n]
        v = np.asarray(res.eigenvector)
        assert np.allclose(H @ v, lam * v, atol=1e-3)
        print("eigen-pair residual check passed (A·v ≈ λ·v)")


if __name__ == "__main__":
    main()
