"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* so that every sharded code path is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path; see ``__graft_entry__.py``).  Must set the platform flags before JAX is
imported anywhere.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the tunnelled TPU
# plugin, which is both slow for unit tests and float32-only.  Tests are the
# float64 oracle; set BET_TEST_PLATFORM to override deliberately.
os.environ["JAX_PLATFORMS"] = os.environ.get("BET_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The tunnelled TPU plugin ignores the JAX_PLATFORMS env var, so pin the
# platform through the config API as well.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Float64 on CPU gives the high-precision oracle used by parity tests; the
# TPU production path runs float32 (see bayesian_ensembling_tpu.utils.config).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
