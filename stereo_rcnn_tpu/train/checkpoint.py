"""Orbax checkpointing of (params, opt_state, uncert, step).

Behavioral reference: ``lib/model/utils/net_utils.py`` — ``save_checkpoint``
(torch.save of {'session', 'epoch', 'model', 'optimizer', 'uncert'}) and the
``--r/--checkepoch`` resume path of ``trainval_net.py`` (SURVEY.md §5
Checkpoint/resume row).
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from stereo_rcnn_tpu.train.step import TrainState


def _manager(ckpt_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    max_to_keep: int = 5) -> None:
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(int(state.step),
             args=ocp.args.StandardSave(state._asdict()))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(ckpt_dir: str, template: TrainState,
                       step: Optional[int] = None) -> TrainState:
    """Restore into the structure of ``template`` (from init_train_state)."""
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(template._asdict()))
    mgr.close()
    return TrainState(**restored)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    s = mgr.latest_step()
    mgr.close()
    return s


# ---------------------------------------------------------------------------
# Params-only export: a flat snapshot of the MODEL parameters (no optimizer
# state, no uncertainty vector) that inference consumers (bench.py, demo,
# test_net) can restore WITHOUT rebuilding a TrainState — restoring into an
# existing identically-structured tree is pure IO, so it never triggers a
# fresh XLA compile (the round-2 bench timeout was caused by exactly that:
# loading a checkpoint whose config implied a different parameter tree and
# therefore a different, uncached program).
# ---------------------------------------------------------------------------

def export_params(export_dir: str, params) -> None:
    """Save an inference-ready ``{"params": model_params}`` pytree."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(export_dir), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def restore_params(export_dir: str, template):
    """Restore a params-only export into ``template``'s exact structure.

    Raises if the stored tree does not match ``template`` (tree structure
    or array shapes), so callers can fall back rather than silently run
    with mismatched weights.
    """
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(export_dir), template)
    ckptr.close()
    return restored
