"""Test config: force CPU backend with 8 virtual devices (sharding tests).

The axon TPU plugin ignores the JAX_PLATFORMS env var, so the backend is
forced via jax.config before any computation runs. Parity tests compare
against torch float32 on CPU; kernel tests opt into Pallas interpret mode.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TPUGAN_PALLAS", "0")  # jnp fallbacks by default

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
