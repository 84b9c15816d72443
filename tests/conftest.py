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
# of it jit compiles of the same integrator/bath programs), so runs
# benefit enormously from the persistent compilation cache. The cache
# lives IN the repo (tests/.xla_cache, committed): a fresh checkout's
# first suite run replays the committed compiles instead of redoing
# them. Entries are keyed on jax version/backend/flags — a mismatch
# silently falls back to a normal compile, so a stale cache can only
# cost time, never correctness. Override with SCLMD_XLA_CACHE.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SCLMD_XLA_CACHE",
                   os.path.join(os.path.dirname(__file__),
                                ".xla_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
