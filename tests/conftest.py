"""Test configuration: force an 8-device CPU platform BEFORE jax is imported.

This is the rebuild's 'fake backend' (SURVEY.md §4): multi-chip sharding tests
run the same shard_map programs on 8 simulated host devices, so no TPU pod is
needed for correctness coverage.
"""

import os

# BF_TEST_TPU=1 opts a test run onto the real chip (e.g. the BF_SOAK long-run,
# which is hours on the 1-core CPU host but minutes on the TPU). Default stays
# the 8-device simulated CPU mesh so sharding coverage needs no pod.
_USE_TPU = bool(os.environ.get("BF_TEST_TPU"))

flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env-var JAX_PLATFORMS route is overridden by the axon TPU plugin on this
# machine; the config API wins.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
