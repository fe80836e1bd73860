"""Opt-in REAL-TPU tests — set ``RUN_TPU_TESTS=1`` to enable.

The default suite pins JAX to the virtual CPU mesh (conftest.py); these
tests explicitly target the attached TPU through the device-pinned API,
exercising the compiled (non-interpret) Pallas path and hardware round
parity.  Run:

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -q
"""

import os

import numpy as np
import pytest

import jax

from eigen_value_tpu import EigenValue, SolverConfig, fixtures

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS"),
    reason="set RUN_TPU_TESTS=1 (needs a real TPU attached)",
)


def _tpu():
    try:
        return jax.devices("tpu")[0]
    except RuntimeError:
        pytest.skip("no TPU device visible")


@pytest.mark.parametrize("n", [1024, 4096])
def test_round_parity_on_hardware(n):
    ev = EigenValue(device=_tpu())
    lam, vec, ms, rounds = ev.similarity_transform(
        np.asarray(fixtures.hilbert_matrix(n))
    )
    assert rounds == fixtures.HILBERT_ROUNDS[n]
    H = np.asarray(fixtures.hilbert_matrix(n))
    assert np.allclose(H @ vec, lam * vec, atol=1e-3)


def test_compiled_pallas_backend_selected():
    ev = EigenValue(device=_tpu())
    backend_key = None
    ev.similarity_transform(np.asarray(fixtures.hilbert_matrix(512)))
    (backend_key,) = ev._compiled.keys()
    assert backend_key[2] == "matvec_pallas"  # compiled, not interpreted


def test_bf16_fast_mode_on_hardware():
    import jax.numpy as jnp

    ev = EigenValue(
        SolverConfig(storage_dtype=jnp.bfloat16), device=_tpu()
    )
    lam, vec, ms, rounds = ev.similarity_transform(
        np.asarray(fixtures.hilbert_matrix(1024))
    )
    assert abs(rounds - fixtures.HILBERT_ROUNDS[1024]) <= 1
