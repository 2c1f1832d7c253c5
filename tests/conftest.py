"""Test harness: force an 8-virtual-device CPU platform BEFORE jax import.

Multi-chip sharding is validated on a fake CPU mesh (SURVEY.md §4); the real
TPU is exercised only by bench.py / the driver.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The image's sitecustomize force-registers the axon TPU platform; pin the
# test session to the 8-virtual-device CPU backend regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
