"""Auxiliary/alternative heads kept for reference parity.

  * CoordAtt (network/coordatt.py:22-58): coordinate attention — h/w pooled
    descriptors, shared 1x1 reduction with hard-swish, per-axis sigmoid
    gates.
  * AttentionMaskHead (network/att_mask_head.py:18-110): conv stack over
    (xyz + 2D coords) predicting a 1-channel attention mask (used when
    mask_attention_type != 'none' trains the mask end-to-end).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from givepose_tpu.models.layers import GroupNorm32, get_act, normal_init
from givepose_tpu.models.mobilenet import hard_swish

Dtype = Any


class CoordAtt(nn.Module):
    """Coordinate attention block (Hou et al., CVPR 2021)."""

    reduction: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        mid = max(8, c // self.reduction)
        # pooled descriptors along each spatial axis
        xh = jnp.mean(x, axis=2)                      # (N, H, C)
        xw = jnp.mean(x, axis=1)                      # (N, W, C)
        y = jnp.concatenate([xh, xw], axis=1)         # (N, H+W, C)
        y = nn.Conv(mid, (1,), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(y)
        y = nn.BatchNorm(use_fast_variance=False, use_running_average=True, dtype=jnp.float32,
                         name="bn1")(y.astype(jnp.float32)
                                     ).astype(self.dtype)
        y = hard_swish(y)
        ah = nn.sigmoid(nn.Conv(c, (1,), dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name="conv_h")(y[:, :h]))
        aw = nn.sigmoid(nn.Conv(c, (1,), dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name="conv_w")(y[:, h:]))
        return x * ah[:, :, None, :] * aw[:, None, :, :]


class AttentionMaskHead(nn.Module):
    """(B, H, W, 5) xyz+coord2d -> (B, H, W, 1) mask logits."""

    featdim: int = 128
    num_layers: int = 3
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        for i in range(self.num_layers):
            h = nn.Conv(self.featdim, (3, 3), padding=[(1, 1)] * 2,
                        use_bias=False, kernel_init=normal_init(0.001),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}")(h)
            h = GroupNorm32(dtype=self.dtype)(h)
            h = get_act(self.act)(h)
        return nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                       dtype=jnp.float32, param_dtype=jnp.float32,
                       name="out")(h.astype(jnp.float32))
