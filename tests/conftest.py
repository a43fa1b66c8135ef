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

# The axon sitecustomize (PYTHONPATH) imports jax at interpreter start, so the
# env var above can be too late — the config value is what the backend
# selector actually reads.  Force it, then verify the mesh is real: without
# the assert, "8-device" tests silently run on a 1-device TPU and still pass.
jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: XLA:CPU compiles dominate suite runtime;
# repeat runs hit the cache and are ~10x faster. OCTSEG_TEST_CACHE_DIR
# overrides the location (set it to a fresh dir to measure a true cold run).
# NOTE: do NOT ship a pre-built cache with the repo — XLA:CPU cache entries
# embed host-specific machine code, and the loader (cpu_aot_loader.cc) will
# load entries compiled for a DIFFERENT cpu's feature set with only a
# warning ("could lead to ... SIGILL"), so a committed cache is a crash (or
# silent-miscompile) hazard on any other rig. Measured while trying exactly
# that: entries warmed on another pool host loaded here despite an
# avx512/amx feature-set mismatch.
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('OCTSEG_TEST_CACHE_DIR',
                                 '/root/.cache/jax_octseg_tests'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

assert jax.default_backend() == 'cpu', (
    f'test harness must run on CPU, got {jax.default_backend()}'
)
assert jax.device_count() == 8, (
    f'test harness needs an 8-device virtual CPU mesh, have {jax.device_count()} '
    f'device(s) — XLA_FLAGS force_host_platform_device_count was not honored'
)

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
