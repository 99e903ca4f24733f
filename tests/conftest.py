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

# Isolate tests from the PERSISTENT compilation cache
# (~/.cache/lapha_jax_cache): concurrent pytest processes reading/writing
# the shared dir segfaulted inside jax's cache deserialization
# (compilation_cache.get_executable_and_time) — and the dir holds the
# precious multi-minute TPU engine compiles, which test churn should not
# touch anyway. Each test session gets its own throwaway dir
# (enable_compilation_cache/apply_platform_env respect the env override).
import tempfile  # noqa: E402

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="lapha_test_jit_cache_")
# ... and the cache's executable (de)serialization itself has segfaulted
# under full-suite memory pressure (put_executable_and_time, jax 0.9.0) —
# tests gain nothing from persisting compiles, so turn it off outright
# (enable_compilation_cache honors this; subprocess CLI tests inherit it).
os.environ["LAPHA_NO_COMPILE_CACHE"] = "1"

# A pytest plugin may have imported jax before this conftest ran; the backend
# is not initialized until first use, so overriding the config still works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Setting JAX_COMPILATION_CACHE_DIR alone ACTIVATES jax's persistent
# cache (jax_enable_compilation_cache defaults True) — which is the
# (de)serialization path that segfaulted. Disable it for real; the env
# vars above remain only to redirect anything that force-enables it.
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices()).reshape(4, 2)
    with Mesh(devs, ("data", "model")) as m:
        yield m


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module: cumulative
    compile state across the whole suite crashed the XLA CPU compiler
    (segfault at ~94%); cross-module cache hits are rare anyway."""
    yield
    import jax

    jax.clear_caches()
