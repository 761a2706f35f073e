"""Test harness: force a LOCAL 8-device virtual CPU mesh.

SURVEY.md §4: multi-chip tests without a pod — fake devices.  Two traps in
this environment (see memory note axon-tpu-serialization):

  * The axon sitecustomize imports jax at interpreter start and force-sets
    ``jax_platforms = "axon,cpu"`` — overriding the JAX_PLATFORMS env var.
    Only a ``jax.config.update`` AFTER import wins.
  * ``XLA_FLAGS=--xla_force_host_platform_device_count`` is likewise dead
    here; ``jax_num_cpu_devices`` config is the working mechanism.

Bench/production runs use the real TPU; tests always run on local CPU so
they are deterministic, parallelisable, and never contend for the tunnel.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compilation cache: the model/train-step compiles dominate test
# wall time; cache them across test runs and sessions.  Each pytest-xdist
# worker gets its OWN cache dir — concurrent writers corrupt each other's
# entries (observed as JaxRuntimeError deserialization failures).
_worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser(f"~/.cache/jax_stereo_cpu_{_worker}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
