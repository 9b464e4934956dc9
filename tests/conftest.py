"""Test harness config: force CPU jax with 8 virtual devices.

Mirrors the reference's test strategy (SURVEY.md section 4): property tests on
real image fixtures + kernel-vs-reference equivalence, extended with multi-device
sharding tests that run on a virtual CPU mesh (no TPU pod needed).
"""
import os

# Must be set before jax is imported anywhere. Force-override: the ambient
# environment may pin JAX_PLATFORMS to the TPU tunnel, which would run every
# tiny test op remotely.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Some images hard-pin jax_platforms (e.g. to "axon,cpu") at import time,
# ignoring the env var — force the config before any backend initialises.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
