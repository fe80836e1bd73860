"""device.py helpers + EigenValue device pinning + profiling utils."""

import jax
import numpy as np
import pytest

from eigen_value_tpu import EigenValue
from eigen_value_tpu.device import auto_interpret, on_tpu, pick_block
from eigen_value_tpu.utils import profiling


def test_pick_block_table():
    assert pick_block(8192, 512) == 512
    assert pick_block(8192, 256) == 256
    assert pick_block(384, 512) == 128
    assert pick_block(640, 512) == 128
    assert pick_block(1024, 1024) == 1024
    assert pick_block(130, 512) is None
    assert pick_block(3, 256) is None
    # n must itself be 128-aligned: a preferred that divides an unaligned
    # n (64 | 192) must NOT produce a Pallas tile (Mosaic lane constraint)
    assert pick_block(192, 64) is None
    assert pick_block(8192, 64) == 64


def test_on_tpu_respects_default_device_pin():
    # conftest pins the default device to CPU
    assert on_tpu() is False
    assert auto_interpret() is True


def test_eigenvalue_device_pinning(rng):
    dev = jax.devices("cpu")[0]
    ev = EigenValue(device=dev)
    mat = rng.random((128, 128), dtype=np.float32)
    lam, vec, _, rounds = ev.similarity_transform(mat)
    assert np.allclose(mat @ vec, lam * vec, atol=1e-3)
    assert 0 < rounds <= 1000


@pytest.mark.slow  # the profiler handshakes with the tunneled TPU backend
def test_profiling_trace_and_annotate(tmp_path, rng):  # ~2 min wall
    from eigen_value_tpu import max_eigenvalue

    mat = rng.random((64, 64), dtype=np.float32)
    with profiling.trace(str(tmp_path / "trace")) as d:
        with profiling.annotate("solve"):
            res = max_eigenvalue(mat)
            jax.block_until_ready(res)
    assert d == str(tmp_path / "trace")
    assert bool(res.converged)


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert stats is None or isinstance(stats, dict)


class TestMatvecBlocks:
    """Full-row tile policy (round 2, device.matvec_blocks)."""

    def test_flagship_dim(self):
        from eigen_value_tpu.device import matvec_blocks

        assert matvec_blocks(8192) == (64, 8192)

    def test_small_dims_whole_rows(self):
        from eigen_value_tpu.device import matvec_blocks

        assert matvec_blocks(512) == (512, 512)
        assert matvec_blocks(1024) == (512, 1024)

    def test_large_dim_shrinks_rows(self):
        from eigen_value_tpu.device import matvec_blocks

        br, bc = matvec_blocks(32768)
        assert bc == 32768
        # double-buffered stripe stays inside the budget
        assert 2 * br * 32768 * 4 <= 8 * (1 << 20)

    def test_nonaligned_dim_returns_none(self):
        from eigen_value_tpu.device import matvec_blocks

        assert matvec_blocks(100) is None
        assert matvec_blocks(3) is None

    def test_aligned_but_odd_multiple(self):
        from eigen_value_tpu.device import matvec_blocks

        br, bc = matvec_blocks(384)  # 3 * 128
        assert bc == 384 and 384 % br == 0


def test_hermetic_cpu_env_strips_plugin_path():
    from eigen_value_tpu.device import hermetic_cpu_env

    base = {
        "PYTHONPATH": "/root/.axon_site:/some/lib:/opt/axon_site_x",
        "JAX_PLATFORMS": "axon",
        "OTHER": "kept",
    }
    env = hermetic_cpu_env(base)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["OTHER"] == "kept"
    parts = [p for p in env["PYTHONPATH"].split(":") if p]
    # plugin sitecustomize dirs (basename contains the plugin name) gone,
    # unrelated entries kept
    assert "/some/lib" in parts
    assert all("axon" not in p.rsplit("/", 1)[-1] for p in parts)
    # input mapping untouched (it returns a copy)
    assert base["JAX_PLATFORMS"] == "axon"


def test_hermetic_cpu_env_defaults_to_os_environ(monkeypatch):
    from eigen_value_tpu.device import hermetic_cpu_env

    monkeypatch.setenv("PYTHONPATH", "/a/b:/x/.axon_site")
    env = hermetic_cpu_env()
    assert env["PYTHONPATH"] == "/a/b"
    assert env["JAX_PLATFORMS"] == "cpu"


def test_unregister_remote_tpu_plugin_idempotent():
    from eigen_value_tpu.device import unregister_remote_tpu_plugin

    # conftest already called it for this interpreter; calling again (and
    # with the factory absent) must be a silent no-op.
    unregister_remote_tpu_plugin()
    unregister_remote_tpu_plugin()
    from jax._src import xla_bridge

    assert "axon" not in xla_bridge._backend_factories
    assert jax.default_backend() == "cpu"
