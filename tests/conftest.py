"""Test harness: force a LOCAL multi-device virtual CPU mesh.

SURVEY.md §4: multi-chip tests without a pod — fake devices.  Three traps
in this environment (see memory note stereo-rcnn-env):

  * The axon sitecustomize imports jax at interpreter start and force-sets
    ``jax_platforms = "axon,cpu"`` — overriding the JAX_PLATFORMS env var.
    Only a ``jax.config.update`` AFTER import wins.
  * ``XLA_FLAGS=--xla_force_host_platform_device_count`` is likewise dead
    here; ``jax_num_cpu_devices`` config is the working mechanism.
  * XLA:CPU hard-ABORTS the process when a cross-device collective
    rendezvous is not joined within 40 s (rendezvous.cc "Termination
    timeout ... Exiting to ensure a consistent program state"), and the
    ``xla_cpu_collective_call_*_timeout_seconds`` flags do not reach this
    code path.  On a 1-core host, 8 device threads each doing a full
    fwd+bwd segment before the gradient psum means the last straggler
    arrives many minutes after the first -> SIGABRT.  Fix: size the fake
    mesh to the host (8 devices only when there are >= 8 cores, else 2 —
    with 2 threads the straggler lag is one device's segment, < 40 s on
    the tiny config).  Sharding-consistency tests are device-count
    agnostic; the driver separately validates the full 8-way layout via
    ``__graft_entry__.dryrun_multichip``.

Bench/production runs use the real TPU; tests always run on local CPU so
they are deterministic, parallelisable, and never contend for the tunnel.
"""

import hashlib
import os

# Raise XLA:CPU's collective-rendezvous termination timeout (default 40 s
# SIGABRTs the run when device threads time-slicing few cores straggle
# into a collective — see module docstring).  XLA parses XLA_FLAGS at
# first compile, after this module runs, so setting it here works even
# though sitecustomize already imported jax.
if "collective_call_terminate" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    ).strip()

import jax

N_DEVICES = 8 if (os.cpu_count() or 1) >= 8 else 2

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", N_DEVICES)
jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compilation cache: the model/train-step compiles dominate test
# wall time; cache them across test runs and sessions.  Each pytest-xdist
# worker gets its OWN cache dir — concurrent writers corrupt each other's
# entries (observed as JaxRuntimeError deserialization failures).  The dir
# is also keyed on a host-CPU-feature fingerprint: these VMs migrate
# between hosts with different microarchitectures, and XLA:CPU warns that
# loading another machine's AOT result "could lead to execution errors
# such as SIGILL".
_worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
try:
    with open("/proc/cpuinfo") as f:
        _flags = next((l for l in f if l.startswith("flags")), "")
except OSError:
    _flags = ""
_cpu_fp = hashlib.sha1(_flags.encode()).hexdigest()[:8]
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser(f"~/.cache/jax_stereo_cpu_{_worker}_{_cpu_fp}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------------------
# Session-scoped model fixtures: param init is a multi-minute XLA-CPU
# compile; share ONE initialisation across all test files (VERDICT round 1:
# cut suite wall time by sharing jitted programs).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="session")
def tiny_cfg_f32():
    from stereo_rcnn_tpu.config import tiny_test_config
    return tiny_test_config().replace(compute_dtype="float32")


@pytest.fixture(scope="session")
def tiny_params(tiny_cfg_f32):
    from stereo_rcnn_tpu.models import init_params
    return init_params(tiny_cfg_f32, jax.random.PRNGKey(0))
