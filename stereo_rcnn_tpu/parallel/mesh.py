"""Device mesh + sharding for data-parallel training/inference.

The reference has essentially no distributed runtime (SURVEY.md §2.3: a
vestigial ``--mGPUs`` DataParallel flag); the TPU rebuild makes data
parallelism first-class: a 1-D ``Mesh`` over all chips, batches sharded on
the ``data`` axis, parameters replicated, gradient reduction emitted by XLA
as ICI collectives from sharding annotations — no NCCL-style code.

A second mesh axis (``model``) is exposed for completeness (the model is
~100M params, so tensor parallelism is documented out-of-scope; the axis
exists so multi-axis layouts compile and future heads can shard over it).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by mp={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-side batch pytree onto the mesh, sharded on dim 0."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def jit_train_step(step_fn, mesh: Mesh):
    """Jit a ``(state, batch, rng) -> (state, metrics)`` step with DP
    shardings pinned: state/rng replicated, batch split on ``data``."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def jit_inference(infer_fn, mesh: Mesh):
    """Jit the full inference pipeline ``(params, left, right, calib_batch)
    -> Detections3D`` data-parallel over the mesh: params replicated,
    images AND per-image calibration sharded on the batch axis, detections
    returned batch-sharded (host gathers lazily on device_get).

    Use with ``inference.make_full_pipeline(cfg)`` (the runtime-calib
    variant).  Multi-chip inference is the serving path the reference never
    had (its test_net.py is strictly single-GPU single-image)."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        infer_fn,
        in_shardings=(rep, bsh, bsh, bsh),
        out_shardings=bsh,
    )
