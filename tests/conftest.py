"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

Multi-chip sharding paths are exercised on fake CPU devices
(xla_force_host_platform_device_count), the JAX-native substitute for the
reference's (absent) distributed tests — see SURVEY.md §4. The environment's
sitecustomize pins JAX_PLATFORMS to the TPU plugin, so we override through
jax.config before any backend is created.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
