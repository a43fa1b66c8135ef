"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the standard JAX fake-backend trick (SURVEY.md §4) — multi-chip
sharding logic is exercised on CPU without TPU hardware.
"""

import os

# Force-assign (not setdefault): the environment pre-exports JAX_PLATFORMS to
# the TPU plugin, which would silently route "CPU" tests through the tunnel.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# Persistent compilation cache: CPU test compiles dominate suite runtime;
# repeat runs hit the cache and are ~10x faster.
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_octseg_tests')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = '/root/reference'


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(11)


@pytest.fixture(scope='session')
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip('reference data not available')
    return REFERENCE_DIR
