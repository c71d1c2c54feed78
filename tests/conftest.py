"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU kernel tests are opt-in via MXMOE_TEST_TPU=1 (they then run in the
default environment where the axon TPU plugin owns the devices).
"""

import os

# Must happen before any jax backend initialization.
if os.environ.get("MXMOE_TEST_TPU", "0") != "1":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax  # noqa: F401

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def on_cpu() -> bool:
    import jax

    return jax.default_backend() == "cpu"
