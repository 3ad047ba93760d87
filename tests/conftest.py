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

# Rebuild the native host plane when its source is newer than the tracked
# .so (a stale binary would silently test old C++ — native.load() dlopens
# whatever file exists). Best-effort: tests that need it skip when absent.
_native_dir = os.path.join(os.path.dirname(__file__), "..", "native")
_so = os.path.join(_native_dir, "libhostplane.so")
_cpp = os.path.join(_native_dir, "hostplane.cpp")
if os.path.exists(_cpp) and (
    not os.path.exists(_so) or os.path.getmtime(_cpp) > os.path.getmtime(_so)
):
    import subprocess

    subprocess.run(["make", "-C", _native_dir], capture_output=True)


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(1234)
