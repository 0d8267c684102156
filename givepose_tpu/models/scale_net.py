"""Metric-scale regressor (reference network/scale_net.py:22-82).

Two MobileNetV3-Small towers over the roi crop and the (resized) full
image, concatenated with the category one-hot (twice) and the bbox (w,h)/100,
predicting a scalar residual over ||mean_size||.  Applied at eval time as
pred_RT[:, :3, :] *= scale (reference evaluation/evaluate.py:125).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from givepose_tpu.models.mobilenet import MobileNetV3Small

Dtype = Any


class ScaleNet(nn.Module):
    feat_dim: int = 24
    use_hw: bool = True
    cats_num: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        roi = batch["roi_img"]            # (B,256,256,3) NHWC
        full = batch["full_img"]          # (B,256,256,3) or (1,256,256,3)
        one_hot = batch["one_hot"].astype(jnp.float32)

        feat_roi = MobileNetV3Small(dtype=self.dtype,
                                    name="feat_encoder_bbox")(
            roi, train=train)
        feat_full = MobileNetV3Small(dtype=self.dtype,
                                     name="feat_encoder_full")(
            full, train=train)
        if full.shape[0] == 1 and roi.shape[0] != 1:
            # eval feeds one shared full image per instance batch; run the
            # tower once and broadcast (saves 24x memory AND compute vs the
            # per-slot tiling the reference does with its ragged batches)
            feat_full = jnp.broadcast_to(
                feat_full, (roi.shape[0],) + feat_full.shape[1:])
        feat_roi = nn.Dropout(0.2, deterministic=not train)(feat_roi)
        feat_full = nn.Dropout(0.2, deterministic=not train)(feat_full)
        feat = jnp.concatenate([feat_roi, feat_full],
                               axis=-1).astype(jnp.float32)

        x = nn.relu(nn.Dense(128, name="line1")(feat))
        x = jnp.concatenate([x, one_hot], axis=-1)
        x = nn.relu(nn.Dense(self.feat_dim, name="line2")(x))
        x = jnp.concatenate([x, one_hot], axis=-1)
        if self.use_hw:
            hw = batch["roi_wh"].astype(jnp.float32) / 100.0
            x = jnp.concatenate([x, hw], axis=-1)
        resid = nn.Dense(1, name="line3")(x)[:, 0]
        mean_scale = jnp.linalg.norm(
            batch["mean_size"].astype(jnp.float32), axis=1)
        return resid + mean_scale
