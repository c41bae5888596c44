"""Test environment: force an 8-device virtual CPU platform.

This is the standard way to exercise pjit/shard_map/mesh code without TPU pods
(SURVEY.md §4): XLA fakes 8 host devices, so sharding tests validate the real
multi-chip program structure.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize force-registers a TPU plugin and overrides
# JAX_PLATFORMS (config becomes "axon,cpu"), which would serialize every test
# process on the single real chip. Override the config itself before any
# backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the heavyweight ResNet train-step compiles
# (~90 s each on CPU XLA) only happen on the first-ever suite run.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mini_town():
    from cilrs_tpu.maps.town import make_mini_town

    return make_mini_town()


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
