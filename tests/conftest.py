"""Test harness: force an 8-device virtual CPU platform before JAX import.

The TPU-native analogue of a fake backend (SURVEY.md §4): all sharding /
multi-chip tests run against ``--xla_force_host_platform_device_count=8`` on
CPU, so the suite needs no TPU and exercises the same pjit/mesh code paths.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU plugin and wins
# over JAX_PLATFORMS env alone; the config update below reliably pins tests
# to the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
