"""Test configuration: CPU backend, float64, 8 virtual devices.

The correctness suite runs on CPU in float64 (the TPU backend in this image
has no f64/complex support; the f32 TPU path is validated structurally by
the same code paths plus dedicated precision tests). A virtual 8-device CPU
mesh backs the sharding tests.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
