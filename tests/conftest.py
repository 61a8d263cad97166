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
# CPU; cache it across test runs. Keyed by the host-ISA fingerprint
# (ppst_tpu.util.cache): an unfingerprinted shared dir demonstrably loads
# XLA:CPU AOT artifacts compiled for another host's target features.
import os as _os

_os.environ.setdefault("PPST_JAX_CACHE_PREFIX", "/root/.cache/jax_ppst_tests")
from ppst_tpu.util.cache import setup_compile_cache

setup_compile_cache(jax)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
