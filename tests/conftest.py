"""Test harness: force an 8-device virtual CPU mesh BEFORE jax imports.

SURVEY.md §4: multi-chip tests without a pod — fake devices via
``--xla_force_host_platform_device_count``.  Bench/production runs use the
real TPU; tests always run on CPU so they are deterministic and fast.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
