"""Test environment: run JAX on CPU with 8 virtual devices.

This is the TPU-native analogue of "multi-node without a cluster"
(SURVEY.md §4): sharding/collective code is validated on a virtual mesh via
``--xla_force_host_platform_device_count`` while numerics are checked against
torch-CPU golden values.
"""
import os

# Must happen before jax is imported anywhere.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU backend and
# sets jax_platforms="axon,cpu"; override after import so tests run on the
# 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compile cache for the suite (VERDICT r4 #9: fast tier under
# 5 min). Many tests rebuild the same VGG/classifier programs in fresh
# closures, which jit cannot dedup (new function identity -> recompile); the
# persistent cache dedups them by program fingerprint both WITHIN one run and
# across runs. Namespaced per (platform, host CPU features) — a cache entry
# can never carry executables across differently-featured hosts
# (ccst_tpu/utils/compile_cache.py). Opt out with CCST_TEST_COMPILE_CACHE=0.
from ccst_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.environ.get("CCST_TEST_COMPILE_CACHE", "~/.cache/ccst_tpu/xla-tests")
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
