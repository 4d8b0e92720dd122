"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding validated
without TPU hardware) with float64 enabled for the oracle comparisons.

NOTE: some TPU plugins ignore the JAX_PLATFORMS env var;
the config API must be used, before any computation.
"""
import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Cap cumulative jit-cache growth across the suite.

    Two independent full-order runs of the whole suite died with an
    XLA-CPU segfault inside backend_compile_and_load after ~200 green
    tests (every subset passes, so it is cumulative compile state, not a
    broken test).  Dropping the traced-executable caches between test
    modules keeps the process-wide compile state bounded; run_tests.py
    remains the belt-and-braces sharded gate."""
    yield
    jax.clear_caches()
