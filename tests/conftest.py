"""Test configuration: run the suite on a virtual 8-device CPU mesh in f64.

The environment's sitecustomize imports jax at interpreter startup and
forces JAX_PLATFORMS=axon (the real TPU tunnel, with slow remote compiles),
so env vars are too late here — ``jax.config.update`` still wins as long as
no backend has been instantiated.  Tests run on CPU with 8 virtual devices
so sharding tests work without hardware (SURVEY.md §4.5).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
