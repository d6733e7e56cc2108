"""Test config: run JAX on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-chip without a cluster": all sharding /
collective code paths compile and execute against 8 host-platform devices.
Must run before the first ``import jax`` anywhere in the test session.
"""
import os

# NOTE: on this image the axon TPU plugin ignores JAX_PLATFORMS, but honors
# JAX_PLATFORM_NAME — set both, before any jax import. Two processes sharing
# the single TPU tunnel deadlock, so tests must never touch the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
