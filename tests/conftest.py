"""Test configuration: force an 8-device virtual CPU mesh + float64.

The container's sitecustomize imports jax (registering the axon TPU
backend) before pytest starts, so env vars are too late — use
jax.config.update instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The fast tier is XLA-COMPILE-bound (~6.5 s/test average, almost all
# of it jit compiles of the same integrator/bath programs), so repeat
# runs benefit enormously from the persistent compilation cache: the
# first run on a container pays full compile, later runs replay from
# ~/.cache. Harmless on CI/fresh containers (cold cache = old
# behavior).
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/sclmd_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
