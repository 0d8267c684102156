"""Prediction heads: TopDownXyzHead, MAPEncoder, ConvPnPNet, SizeHead.

NHWC flax ports of the reference heads:
  * TopDownXyzHead (network/xyz_head.py:195-366): deconv + 2x bilinear
    upsampling 8->64 with GN/GELU ConvModules and a shared 1x1 output conv
    split into x/y/z planes.
  * MAPEncoder (network/conv_pnp_net.py:203-332): 3 stride-2 conv blocks
    64->8 whose conv layer is DCNv3 by default (FLAGS.use_dcn='dcnv3').
  * ConvPnPNet (network/conv_pnp_net.py:18-201): 3 stride-2 convs then
    twin MLPs for (rot6d, centroid) and z.
  * SizeHead (network/pose_head.py:17-51): global max-pool + 2-layer MLP
    residual over the normalized per-category mean size.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from givepose_tpu.models.layers import (
    ConvModule,
    DeconvModule,
    DropBlock2D,
    GroupNorm32,
    get_act,
    normal_init,
    upsample_2x,
)
from givepose_tpu.models.dcnv3_module import DCNv3Conv

Dtype = Any


class TopDownXyzHead(nn.Module):
    """stride-32 feature -> (coor_x, coor_y, coor_z) 64x64 planes."""

    feat_dim: int = 256
    up_types: Sequence[str] = ("deconv", "bilinear", "bilinear")
    num_conv_per_block: int = 2
    act: str = "gelu"
    out_dim: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x
        for i, up in enumerate(self.up_types):
            if up == "deconv":
                y = DeconvModule(self.feat_dim, act=self.act,
                                 dtype=self.dtype)(y)
            elif up in ("bilinear", "nearest"):
                y = upsample_2x(y, up)
            else:
                raise ValueError(f"unknown up_type {up}")
            for _ in range(self.num_conv_per_block):
                y = ConvModule(self.feat_dim, 3, act=self.act,
                               dtype=self.dtype)(y)
        out = nn.Conv(self.out_dim, (1, 1), use_bias=True,
                      kernel_init=normal_init(0.01),
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="out_layer")(y)
        out = out.astype(jnp.float32)
        # reference splits the shared conv output into x/y/z planes
        # (xyz_head.py:354-366); NHWC keeps them as trailing channels
        return out[..., 0:1], out[..., 1:2], out[..., 2:3]


class MAPEncoder(nn.Module):
    """Dense-coordinate-map encoder: 3 stride-2 DCNv3 (or conv) blocks."""

    featdim: int = 256
    outdim: int = 256
    num_stride2_layers: int = 3
    use_dcn: str = "dcnv3"
    dcn_impl: str = "auto"
    dcn_window: int = 0
    gelu_exact: bool = False
    act: str = "relu"
    # DropBlock on the input when drop_prob > 0 (reference
    # conv_pnp_net.py:326-328); the caller supplies the LinearScheduler-
    # ramped rate at call time (functional equivalent of .step()).
    drop_prob: float = 0.0
    dropblock_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, dropblock_rate=0.0, deterministic: bool = True):
        y = x
        if self.drop_prob > 0:
            y = DropBlock2D(block_size=self.dropblock_size)(
                y, rate=dropblock_rate, deterministic=deterministic)
        for i in range(self.num_stride2_layers):
            features = (self.outdim if i == self.num_stride2_layers - 1
                        else self.featdim)
            if self.use_dcn == "dcnv3":
                y = DCNv3Conv(features, stride=2, impl=self.dcn_impl,
                              gelu_exact=self.gelu_exact,
                              window=self.dcn_window,
                              dtype=self.dtype, name=f"dcn{i}")(y)
            else:
                y = nn.Conv(features, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            kernel_init=normal_init(0.001),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{i}")(y)
            y = GroupNorm32(dtype=self.dtype)(y)
            y = get_act(self.act)(y)
        return y


class ConvPnPNet(nn.Module):
    """(IVFC xyz + 2D coords) 64x64 -> rot6d + (cx, cy, z)."""

    featdim: int = 128
    rot_dim: int = 6
    num_stride2_layers: int = 3
    mask_attention_type: str = "none"
    flat_op: str = "flatten"
    act: str = "relu"
    # see MAPEncoder: reference conv_pnp_net.py:160-162
    drop_prob: float = 0.0
    dropblock_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coor_feat, mask_attention=None,
                 dropblock_rate=0.0, deterministic: bool = True):
        x = coor_feat
        if self.mask_attention_type == "mul":
            x = x * mask_attention
        elif self.mask_attention_type == "concat":
            x = jnp.concatenate([x, mask_attention], axis=-1)
        elif self.mask_attention_type != "none":
            raise ValueError(self.mask_attention_type)

        if self.drop_prob > 0:
            x = DropBlock2D(block_size=self.dropblock_size)(
                x, rate=dropblock_rate, deterministic=deterministic)
        x = x.astype(self.dtype)
        for i in range(self.num_stride2_layers):
            x = nn.Conv(self.featdim, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=normal_init(0.001),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}")(x)
            x = GroupNorm32(dtype=self.dtype)(x)
            x = get_act(self.act)(x)

        pnp_feat = x
        flat = x.reshape(x.shape[0], -1, x.shape[-1])   # (B, HW, C)
        if self.flat_op == "flatten":
            # reference flattens (C, H*W) row-major — channel-major order;
            # equivalent information, fc weights are learned either way
            flat = flat.transpose(0, 2, 1).reshape(x.shape[0], -1)
        elif self.flat_op == "avg":
            flat = flat.mean(axis=1)
        elif self.flat_op == "avg-max":
            flat = jnp.concatenate([flat.mean(1), flat.max(1)], axis=-1)
        elif self.flat_op == "avg-max-min":
            flat = jnp.concatenate(
                [flat.mean(1), flat.max(1), flat.min(1)], axis=-1)
        else:
            raise ValueError(f"Invalid flat_op: {self.flat_op}")

        act = get_act("lrelu")  # reference uses lrelu for fc acts (:57)
        h = act(nn.Dense(1024, kernel_init=normal_init(0.001),
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="fc1")(flat))
        h = act(nn.Dense(256, kernel_init=normal_init(0.001),
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="fc2")(h))
        rot = nn.Dense(self.rot_dim, kernel_init=normal_init(0.01),
                       dtype=jnp.float32, param_dtype=jnp.float32,
                       name="fc_r")(h.astype(jnp.float32))
        t2d = nn.Dense(2, kernel_init=normal_init(0.01),
                       dtype=jnp.float32, param_dtype=jnp.float32,
                       name="fc_t")(h.astype(jnp.float32))

        hz = act(nn.Dense(1024, kernel_init=normal_init(0.001),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="fc1_z")(flat))
        hz = act(nn.Dense(256, kernel_init=normal_init(0.001),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="fc2_z")(hz))
        z = nn.Dense(1, kernel_init=normal_init(0.001),
                     dtype=jnp.float32, param_dtype=jnp.float32,
                     name="fc_z")(hz.astype(jnp.float32))

        t = jnp.concatenate([t2d, z], axis=-1)
        return rot, t, pnp_feat


class SizeHead(nn.Module):
    """Global max-pool over the 8x8 feature -> 3-d size residual."""

    feat_dim: int = 128
    out_dim: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # (B, H, W, C) -> (B, C): spatial max (reference pose_head.py:34)
        y = jnp.max(x.reshape(x.shape[0], -1, x.shape[-1]), axis=1)
        y = nn.Dense(self.feat_dim, kernel_init=normal_init(0.001),
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="conv1")(y.astype(self.dtype))
        y = nn.BatchNorm(use_fast_variance=False, use_running_average=deterministic,
                         momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn1")(
            y.astype(jnp.float32))
        y = nn.relu(y)
        y = nn.Dropout(0.2, deterministic=deterministic)(y)
        y = nn.Dense(self.out_dim, kernel_init=normal_init(0.001),
                     dtype=jnp.float32, param_dtype=jnp.float32,
                     name="conv2")(y)
        return y[:, :3]
