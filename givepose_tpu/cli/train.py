"""Training CLI (reference engine/train.py:28-162; engine/pre_train.py
is byte-identical except it lacks the AdamW optimizer branch, so this
one CLI covers both reference entry points).

Usage:
  python -m givepose_tpu.cli.train --dataset CAMERA+Real \\
      --dataset_dir ./data/NOCS --batch_size 48 --total_epoch 300

Differences from the reference, by design (SURVEY.md §7):
  * preprocessing (DZI/crops/color aug/mask deform) runs on device inside
    the step, not in worker processes;
  * the train step is one jitted function over a data-parallel mesh;
  * the loss's symmetry resolution is batched on device (no per-step
    GPU->CPU sync);
  * checkpoints carry optimizer + schedule state (exact resume);
  * the failure seam (reference :133-143) is on-device: non-finite
    gradient steps are SKIPPED by optax.apply_if_finite (no host sync,
    params never corrupted), and when the skip counter grows by the next
    log point the current batch + a state checkpoint are dumped to
    <model_save>/exception/ for offline debugging.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from givepose_tpu.core.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from givepose_tpu.core.config import Config, parse_overrides
from givepose_tpu.core.logging_utils import (
    MetricLogger,
    StepTimer,
    setup_logger,
)
from givepose_tpu.core.mesh import (
    initialize_distributed,
    make_mesh_for_batch,
    shard_host_batch,
)
from givepose_tpu.data import NocsRecordReader, TrainPipeline, \
    preprocess_batch
from givepose_tpu.models import PoseNet
from givepose_tpu.train import init_train_state, make_train_step
from jax.sharding import NamedSharding, PartitionSpec as P


def build_model_batch(raw, key, cfg: Config, train=True):
    """Device preprocessing -> the dict PoseNet/PoseLoss consume."""
    out = preprocess_batch(
        key, {k: jnp.asarray(v) for k, v in raw.items()},
        img_size=cfg.data.img_size, out_res=cfg.data.out_res, train=train,
        color_aug_prob=cfg.data.color_aug_prob if train else 0.0,
        resize_full=cfg.model.resize_full,
        mask_pro=cfg.data.roi_mask_pro,
        dzi_type=cfg.data.dzi_type,
        dzi_pad_scale=cfg.data.dzi_pad_scale,
        dzi_scale_ratio=cfg.data.dzi_scale_ratio,
        dzi_shift_ratio=cfg.data.dzi_shift_ratio)
    return out


def train(argv=None, max_steps: int | None = None,
          backbone_variant: str = "base"):
    initialize_distributed()   # no-op outside a multi-host launch
    cfg = parse_overrides(Config(), argv if argv is not None
                          else sys.argv[1:])
    if cfg.model.quant_dense:
        raise ValueError(
            "quant_dense is an int8 SERVING mode: gradients through the "
            "activation rounding are zero, so training with it silently "
            "freezes the quantized weights. Unset it for training.")
    os.makedirs(cfg.train.model_save, exist_ok=True)
    logger = setup_logger(
        "train", os.path.join(cfg.train.model_save, "log_train.txt"))
    metrics_log = MetricLogger(cfg.train.model_save)
    with open(os.path.join(cfg.train.model_save, "config.json"),
              "w") as f:
        f.write(cfg.to_json())   # flags snapshot (reference :32)

    reader = NocsRecordReader(
        cfg.data.dataset, "train", cfg.data.dataset_dir,
        cfg.data.ivfc_dir, per_obj=cfg.data.per_obj,
        ban_mug=cfg.data.ban_mug)
    pipeline = TrainPipeline(reader, cfg.train.batch_size,
                             cfg.train.train_size, cfg.data.syn_ratio,
                             seed=cfg.train.seed,
                             process_id=jax.process_index(),
                             num_processes=jax.process_count())

    mesh = make_mesh_for_batch(cfg.train.batch_size,
                               cfg.train.mesh_shape)
    model = PoseNet(cfg=cfg.model, backbone_variant=backbone_variant)

    # counter-based rng: every step's keys are fold_in(key0, step), not a
    # sequential split chain — so a resumed process derives the SAME
    # augmentation/step keys the uninterrupted run would have used at
    # that step (bit-exact resume even with DZI/color aug enabled)
    key0 = jax.random.PRNGKey(cfg.train.seed)
    first_raw = next(iter(pipeline.epoch()))
    sample = build_model_batch(first_raw,
                               jax.random.fold_in(key0, 2**32 - 1), cfg)
    state = init_train_state(model, cfg, sample)
    step_fn, _ = make_train_step(model, cfg, mesh=mesh)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    start_epoch = 0
    ckpt = None
    if cfg.train.resume:
        ckpt = (cfg.train.resume_model
                or latest_checkpoint(cfg.train.model_save))
    if ckpt:
        state = restore_checkpoint(ckpt, state)
        start_epoch = cfg.train.resume_point
        if start_epoch == 0 and int(state.step) > 0:
            # derive the epoch from the checkpointed step (exact resume;
            # the reference instead restarts its LR schedule, SURVEY §5)
            spe = max(cfg.train.train_size // cfg.train.batch_size, 1)
            start_epoch = int(state.step) // spe
        # replay the host randomness (sampler epoch draws + per-epoch
        # read-rng counter) so epoch E sees the same index stream AND
        # the same per-sample instance choices the uninterrupted run
        # would have fed it — bit-exact resume needs both
        pipeline.skip_epochs(start_epoch)
        logger.info("resumed from %s at epoch %d", ckpt, start_epoch)

    timer = StepTimer()
    global_step = int(state.step)
    # resume-safe baseline for the skip counter (one host sync, startup)
    notfinite_seen = int(getattr(state.opt_state, "total_notfinite", 0))
    for epoch in range(start_epoch, cfg.train.total_epoch):
        for raw in pipeline.epoch():
            k_pre, k_step = jax.random.split(
                jax.random.fold_in(key0, global_step))
            batch = build_model_batch(raw, k_pre, cfg)
            batch = shard_host_batch(mesh, batch)
            state, step_metrics = step_fn(state, batch, k_step)
            global_step += 1
            timer.tick()
            if global_step % cfg.train.log_every == 0:
                vals = {k: float(v) for k, v in step_metrics.items()}
                total = vals.get("total_loss", float("nan"))
                nf = int(vals.pop("notfinite_total", 0))
                if nf > notfinite_seen or not np.isfinite(total):
                    # failure seam (reference :133-143).  The skipped
                    # steps already left params untouched (on-device
                    # apply_if_finite guard); persist the current batch
                    # + state for offline debugging and continue.
                    dump_dir = os.path.join(cfg.train.model_save,
                                            "exception")
                    os.makedirs(dump_dir, exist_ok=True)
                    np.savez(os.path.join(dump_dir,
                                          f"step{global_step}.npz"),
                             **{k: np.asarray(v)
                                for k, v in raw.items()})
                    save_checkpoint(os.path.join(
                        dump_dir, f"state_{global_step}"), state,
                        keep=3)
                    logger.warning(
                        "%d non-finite update(s) skipped by step %d "
                        "(loss %.4f); batch + state dumped to %s",
                        nf - notfinite_seen, global_step, total,
                        dump_dir)
                    notfinite_seen = nf
                vals["steps_per_sec"] = (1.0 / timer.mean
                                         if timer.mean else 0.0)
                vals["imgs_per_sec"] = (cfg.train.batch_size / timer.mean
                                        if timer.mean else 0.0)
                metrics_log.log(global_step, vals)
                logger.info("epoch %d step %d loss %.4f (%.1f img/s)",
                            epoch, global_step, total,
                            vals["imgs_per_sec"])
            if max_steps is not None and global_step >= max_steps:
                save_checkpoint(os.path.join(cfg.train.model_save,
                                             f"ckpt_{global_step}"),
                                state, keep=cfg.train.keep_checkpoints)
                return state
        if (epoch + 1) % cfg.train.save_every == 0 \
                or epoch == cfg.train.total_epoch - 1:
            save_checkpoint(os.path.join(cfg.train.model_save,
                                         f"ckpt_{global_step}"), state,
                            keep=cfg.train.keep_checkpoints)
            logger.info("saved checkpoint at epoch %d", epoch)
        if (cfg.train.restart_every
                and (epoch + 1) % cfg.train.restart_every == 0
                and epoch != cfg.train.total_epoch - 1):
            save_checkpoint(os.path.join(cfg.train.model_save,
                                         f"ckpt_{global_step}"), state,
                            keep=cfg.train.keep_checkpoints)
            logger.info("restart_every: exiting cleanly after epoch %d "
                        "(resume with --resume 1)", epoch)
            metrics_log.close()
            raise SystemExit(75)   # EX_TEMPFAIL: wrapper should resume
    metrics_log.close()
    return state


if __name__ == "__main__":
    train()
