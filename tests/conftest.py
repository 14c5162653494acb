"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding
tests (sharded-equals-single-device, the analogue of the reference's
tiled-equals-whole ``TestBlockRasterize.cxx``) can run without TPU hardware.

The container's sitecustomize pre-imports JAX with a TPU platform selected via
``JAX_PLATFORMS=axon``, so env vars are too late — use ``jax.config.update``
before any backend is initialized. bench.py is what runs on real hardware.
"""

import os

# XLA flags are read at backend creation, which hasn't happened yet at
# conftest-import time even though jax itself is already imported.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_compiler_state():
    """Free compiled executables between test modules.

    The full suite compiles many hundreds of XLA:CPU programs in one
    process; past ~45 minutes the accumulated compiler/runtime state can
    segfault a later compile inside ``backend_compile_and_load`` (observed
    twice in ``test_tools`` — the alphabetically last heavy module — while
    every module passes in isolation). Dropping the jit caches per module
    bounds that state; per-module recompiles cost little because modules
    share few jitted signatures."""
    yield
    jax.clear_caches()
