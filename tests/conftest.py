"""Test env: force an 8-device virtual CPU platform before JAX initializes.

Mesh-sharded tests (value forward, GRPO update, multichip dryrun) run on
8 virtual CPU devices so no TPU hardware is needed for CI.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# A pytest plugin may have imported jax before this conftest ran; the backend
# is not initialized until first use, so overriding the config still works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices()).reshape(4, 2)
    with Mesh(devs, ("data", "model")) as m:
        yield m
