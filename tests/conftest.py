"""Test harness config: force an 8-virtual-device CPU JAX platform.

Multi-chip hardware is not available in CI; sharding tests run on a virtual
8-device CPU mesh (XLA host-platform device-count override — the
fake-backend equivalent noted in SURVEY.md §4).  Pallas kernels run in
interpret mode on CPU, which doubles as the sanitizer pass (SURVEY.md §5).
This must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Under the axon tunnel JAX_PLATFORMS is ignored (the TPU plugin registers
# regardless), so pin the default device to CPU explicitly; mesh tests use
# jax.devices("cpu") which honors the 8-device override above.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture
def rng():
    return np.random.default_rng(0xE16E7)


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def subprocess_env(**overrides) -> dict:
    """Environment for worker subprocesses: repo on PYTHONPATH (the package
    is not installed), caller's overrides applied last."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [REPO_ROOT, env.get("PYTHONPATH")])
    )
    env.update(overrides)
    return env
