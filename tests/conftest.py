"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference had no automated tests at all (SURVEY.md §4); this suite is the
parity/property pyramid it lacked. CPU keeps tests hermetic and lets
multi-chip sharding paths run via --xla_force_host_platform_device_count.

NOTE: under the axon TPU plugin the JAX_PLATFORMS env var is IGNORED (the
plugin force-registers itself); only jax.config.update('jax_platforms', ...)
actually selects the CPU backend. XLA_FLAGS must still be set before the CPU
backend initializes.
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


@pytest.fixture
def rng():
    return np.random.default_rng(42)
