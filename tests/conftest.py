"""Test configuration: 8 virtual CPU devices, fp64 enabled.

Multi-chip sharding logic is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) as the real environment has a
single TPU chip; fp64 gives the bit-level physics oracle mode
(SURVEY.md §7 'fp64 policy').
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The environment's sitecustomize registers an experimental remote-TPU
# ("axon") platform and forces JAX_PLATFORMS=axon before conftest runs;
# override at the config level (backends init lazily, so this wins).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's wall time is dominated by
# XLA compiles of near-identical programs across test processes; the
# cache keys on the HLO hash, so it is safe across code edits (changed
# programs miss, unchanged ones hit).
_CACHE = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pathlib

import pytest

REFERENCE_EXAMPLES = pathlib.Path("/root/reference/examples")


@pytest.fixture(scope="session")
def examples_dir():
    if not REFERENCE_EXAMPLES.is_dir():
        pytest.skip("reference examples not mounted")
    return REFERENCE_EXAMPLES
