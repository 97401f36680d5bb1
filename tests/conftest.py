"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests follow SURVEY.md §4's strategy of
``xla_force_host_platform_device_count`` (no TPU needed for correctness tests).
Must run before jax is imported anywhere.
"""
import os

# the driver environment pre-sets JAX_PLATFORMS=axon (TPU); tests force CPU
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# jax may have been imported (with JAX_PLATFORMS=axon) before this conftest ran;
# force the CPU backend explicitly as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
