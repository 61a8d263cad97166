"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the TPU-native replacement for "test multi-node without a
cluster" (SURVEY.md section 4): the pjit train step, all_gather queue
updates, and per-host sharding are validated against the single-device
path on host CPU devices. Must run before jax initializes its backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The machine's sitecustomize imports jax (registering the TPU plugin)
# before conftest runs, so the env var alone is ignored; update the live
# config too.
import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the G-step graph takes minutes to compile on
# CPU; cache it across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ppst_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
