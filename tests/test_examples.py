"""The shipped examples must stay runnable (CPU, 8 virtual devices)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name: str) -> str:
    from conftest import subprocess_env

    env = subprocess_env(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", name)],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


@pytest.mark.slow
def test_quickstart_example():
    out = _run_example("quickstart.py")
    assert "round(s)" in out
    assert "functional: λ" in out
    assert "bf16 fast mode" in out


@pytest.mark.slow
def test_autodiff_example():
    out = _run_example("autodiff.py")
    assert "target 40.0" in out
    assert "∂v[0]/∂A" in out


@pytest.mark.slow
def test_serving_example():
    out = _run_example("serving.py")
    assert "artifact: solver_1024.bin" in out
    assert "served solve" in out and "rounds = 13" in out
    assert "residual check passed" in out


@pytest.mark.slow
def test_distributed_example():
    out = _run_example("distributed.py")
    assert "sharded (8 devices)" in out and "rounds = 13 (expect 13)" in out
    assert "ring:" in out
    assert "checkpointed" in out


@pytest.mark.slow
def test_matrix_free_example():
    out = _run_example("matrix_free.py")
    assert "operator solve (FFT Hankel" in out
    assert "matches dense within 1e-3" in out
    assert "convergence: rate" in out
    assert "f64 polish: λ" in out


@pytest.mark.slow
def test_pagerank_example():
    out = _run_example("pagerank.py")
    assert "exact answer: λ = 1" in out
    assert "dense cross-check" in out
    assert "top-5 nodes:" in out
