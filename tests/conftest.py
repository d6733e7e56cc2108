"""Test config: run JAX on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-chip without a cluster": all sharding /
collective code paths compile and execute against 8 host-platform devices.
Must run before the first ``import jax`` anywhere in the test session.
"""
import os

# NOTE: the shell profile sets JAX_PLATFORMS=axon (the real TPU tunnel) and
# the jaxtyping pytest plugin imports jax BEFORE this conftest runs, binding
# the platform from env at import. Two processes sharing the single TPU
# tunnel deadlock, so tests must never touch the TPU: override both env vars
# AND the live jax config (config.update works any time before backend init).
#
# Exception: MDGEN_TPU_TESTS=1 opts in to the real chip for the TPU-gated
# tests (tests/test_flash_tpu.py). Run those alone, never concurrently with
# another TPU process.
if os.environ.get("MDGEN_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if os.environ.get("MDGEN_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
