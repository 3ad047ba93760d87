"""Test config: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count=8``) since the build machine has a
single real TPU chip. In this environment JAX is pre-imported and initialized
on the experimental ``axon`` TPU platform at interpreter startup, so setting
env vars here is not enough — the backend must be explicitly reset to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb

_xb._clear_backends()

assert jax.default_backend() == "cpu" and jax.device_count() >= 8

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(1234)
