"""Test configuration: force an 8-device CPU platform BEFORE any jax backend
initializes.

This is the TPU build's analogue of the reference's single-node fake-multiworker
harness (src/distributed_training.py): sharding/collective tests run on a virtual
8-device CPU mesh, no TPU required.

Note: the environment pre-imports jax at interpreter startup (axon
sitecustomize), so plain env-var exports are too late for the platform choice —
we use jax.config.update, which works as long as no backend has initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1999)
