"""Test configuration: force an 8-device virtual CPU mesh for sharding tests.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on
virtual CPU devices exactly as the driver's dryrun does.  NOTE: the axon
platform plugin overrides the JAX_PLATFORMS env var in this image, so we
must use jax.config.update before any backend is initialized.
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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1951)
