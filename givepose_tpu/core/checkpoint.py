"""Checkpointing via orbax.

Reference persistence is plain torch.save of model/optimizer state every
save_every epochs (engine/train.py:156-159) and notably does NOT save the
scheduler step (SURVEY.md §5: resume restarts the schedule).  Here one
orbax checkpoint carries (params, batch_stats, opt_state, step), so resume
is exact including the lr schedule position.
"""

from __future__ import annotations

import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp

from givepose_tpu.train.step import TrainState


def save_checkpoint(path: str, state: TrainState, keep: int = 0):
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    host_state = jax.tree_util.tree_map(np.asarray, state)
    ckptr.save(path, host_state, force=True)
    ckptr.wait_until_finished()
    _prune_checkpoints(os.path.dirname(path), os.path.basename(path), keep)


def _prune_checkpoints(model_dir: str, just_saved: str, keep: int) -> None:
    """Keep only the newest ``keep`` checkpoints sharing just_saved's
    name prefix (ckpt_N / scale_ckpt_N); long runs with small save_every
    or restart_every would otherwise fill the disk (each ConvNeXt-B +
    Ranger state is hundreds of MB)."""
    if not keep or keep <= 0 or "_" not in just_saved:
        return
    prefix = just_saved.rsplit("_", 1)[0] + "_"
    cands = [d for d in os.listdir(model_dir)
             if d.startswith(prefix) and d[len(prefix):].isdigit()
             and os.path.isdir(os.path.join(model_dir, d))]
    cands.sort(key=lambda d: int(d[len(prefix):]))
    for d in cands[:-keep]:
        shutil.rmtree(os.path.join(model_dir, d), ignore_errors=True)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    host_template = jax.tree_util.tree_map(np.asarray, template)
    restored = ckptr.restore(path, host_template)
    return jax.tree_util.tree_map(lambda t, r: r, template, restored)


def latest_checkpoint(model_dir: str) -> str | None:
    if not os.path.isdir(model_dir):
        return None
    cands = [d for d in os.listdir(model_dir)
             if d.startswith("ckpt_") and
             os.path.isdir(os.path.join(model_dir, d))]
    if not cands:
        return None
    cands.sort(key=lambda d: int(d.split("_")[1]))
    return os.path.join(model_dir, cands[-1])
