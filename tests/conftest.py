"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip sharding behavior is tested without TPUs via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4) — the analog of
testing multi-node without a cluster.  These env vars must be set before the
first ``import jax`` anywhere in the test process.
"""

import os

# The session environment presets JAX_PLATFORMS=axon (a tunneled real TPU
# chip) and its sitecustomize imports jax at interpreter startup, so setting
# the env var here is too late for jax's config default.  Backends are still
# uninitialized at this point, so jax.config.update works; XLA_FLAGS is read
# lazily when the CPU client is created, so setting it here is in time.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
