"""Test harness: force an 8-device virtual CPU mesh (the TPU-equivalent of
"multi-node without a cluster", SURVEY.md §4) before JAX initializes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def eight_devices():
    assert len(jax.devices()) == 8
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
