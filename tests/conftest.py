"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding tests (SURVEY.md §4 implication) run on a virtual CPU
mesh; this must be configured before jax is first imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# This image injects jax_platforms='axon,cpu' (the TPU tunnel) over the env
# var, so force CPU through the config API — tests must run on the virtual
# 8-device CPU mesh, not the single real chip.
jax.config.update("jax_platforms", "cpu")

# This environment's CPU backend runs matmuls at reduced precision by default
# (oneDNN); force accurate matmuls for numerical parity tests.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(24)
