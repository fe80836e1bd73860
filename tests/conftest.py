"""Test harness config: force an 8-virtual-device CPU JAX platform.

Multi-chip hardware is not available in CI; sharding tests run on a virtual
8-device CPU mesh (XLA host-platform device-count override — the
fake-backend equivalent noted in SURVEY.md §4).  Pallas kernels run in
interpret mode on CPU, which doubles as the sanitizer pass (SURVEY.md §5).
This must run before jax is imported anywhere.
"""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Hermetic-CPU mode: the suite must not depend on (or interfere with) the
# remote-TPU tunnel — a plain ``pytest`` run used to hold the tunnel open
# (serializing against concurrent benches) and hang at collection whenever
# it wedged, because jax initializes every registered plugin regardless of
# JAX_PLATFORMS.  eigen_value_tpu.device is the policy home; opt-in
# hardware runs (RUN_TPU_TESTS=1) keep the plugin.
HERMETIC_CPU = os.environ.get("RUN_TPU_TESTS") != "1"

# Env first (read at backend init): platform pin + virtual device count.
if HERMETIC_CPU:
    # The interpreter's jax.config may still read "axon" at import; fixed
    # via config.update below once jax is imported.
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from eigen_value_tpu import device as _device  # noqa: E402

if HERMETIC_CPU:
    _device.unregister_remote_tpu_plugin()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if HERMETIC_CPU:
    # jax read JAX_PLATFORMS (possibly "axon") into its config at import;
    # point it at the only platform we want initialized.
    jax.config.update("jax_platforms", "cpu")
# Belt-and-braces (and the only guard for RUN_TPU_TESTS=1 runs, where the
# TPU plugin stays registered and JAX_PLATFORMS is ignored): pin the
# default device to CPU explicitly; mesh tests use jax.devices("cpu")
# which honors the 8-device override above.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture
def rng():
    return np.random.default_rng(0xE16E7)


def subprocess_env(**overrides) -> dict:
    """Environment for worker subprocesses: repo on PYTHONPATH (the package
    is not installed), caller's overrides applied last.

    In hermetic-CPU mode children get ``device.hermetic_cpu_env`` — a
    fresh interpreter re-runs the plugin's sitecustomize, and
    JAX_PLATFORMS alone does not stop a registered plugin from
    initializing, so a child dialing a wedged tunnel would hang its test.
    """
    env = _device.hermetic_cpu_env() if HERMETIC_CPU else dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        filter(None, [REPO_ROOT, env.get("PYTHONPATH")])
    )
    env.update(overrides)
    return env
