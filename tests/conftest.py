"""Test config: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding is validated on CPU-simulated meshes
(``xla_force_host_platform_device_count``), per SURVEY §4's prescription;
real-TPU benchmarking happens in bench.py, not in tests.

Note: the environment's sitecustomize pre-registers a TPU backend before
pytest starts, so plain ``JAX_PLATFORMS=cpu`` env vars are not enough —
we override through jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

import tpu_spai  # noqa: F401  (enables x64)

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
