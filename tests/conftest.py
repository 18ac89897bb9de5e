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

import hashlib

import jax

jax.config.update("jax_platforms", "cpu")


def _host_cpu_key() -> str:
    """Hash of the host CPU feature flags.

    JAX's persistent cache keys on jaxlib version + XLA flags but NOT on
    host CPU features; CPU-backend executables AOT-compiled on a host with
    different ISA extensions deserialize fine and then fail at run time
    (e.g. "UNIMPLEMENTED: DotThunk BF16 x BF16" when an AVX512-BF16 host's
    executable lands on a plain AVX2 host). The driver moves this repo
    between heterogeneous hosts, so key the cache dir per CPU identity.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


# The gate is compile-bound on this 1-CPU image (~200 graph variants);
# the persistent cache cuts warm reruns ~3x. Keyed by jaxlib version +
# XLA flags (by JAX) plus host CPU features (subdir), so it never serves
# stale or foreign executables.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_test_cache",
                               _host_cpu_key()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
