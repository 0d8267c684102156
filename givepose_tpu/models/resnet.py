"""ResNet family (NHWC flax) — reference network/resnet.py:25-260.

Used by the reference as alternative backbones / alternative PnP encoders
(ResPnPNet, conv_pnp_net.py:334+); kept for config parity.  BatchNorm runs
in f32 with a mutable batch_stats collection.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_fast_variance=False, use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=jnp.float32, name=name)(
                h.astype(jnp.float32)).astype(self.dtype)

        residual = x
        h = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        h = nn.relu(bn(h, "bn1"))
        h = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        h = bn(h, "bn2")
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="downsample")(x)
            residual = bn(residual, "bn_down")
        return nn.relu(h + residual)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_fast_variance=False, use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=jnp.float32, name=name)(
                h.astype(jnp.float32)).astype(self.dtype)

        out_features = self.features * 4
        residual = x
        h = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        h = nn.relu(bn(h, "bn1"))
        h = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv2")(h)
        h = nn.relu(bn(h, "bn2"))
        h = nn.Conv(out_features, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv3")(h)
        h = bn(h, "bn3")
        if self.stride != 1 or x.shape[-1] != out_features:
            residual = nn.Conv(out_features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="downsample")(x)
            residual = bn(residual, "bn_down")
        return nn.relu(h + residual)


class ResNet(nn.Module):
    block: type = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    in_features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.in_features, (7, 7), (2, 2),
                    padding=[(3, 3)] * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem")(x.astype(self.dtype))
        h = nn.BatchNorm(use_fast_variance=False, use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="stem_bn")(h.astype(jnp.float32)
                                         ).astype(self.dtype)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        features = self.in_features
        for stage, depth in enumerate(self.layers):
            for b in range(depth):
                stride = 2 if (stage > 0 and b == 0) else 1
                h = self.block(features, stride=stride, dtype=self.dtype,
                               name=f"stage{stage}_block{b}")(h,
                                                              train=train)
            features *= 2
        return h


def resnet18(dtype=jnp.float32):
    return ResNet(BasicBlock, (2, 2, 2, 2), dtype=dtype)


def resnet34(dtype=jnp.float32):
    return ResNet(BasicBlock, (3, 4, 6, 3), dtype=dtype)


def resnet50(dtype=jnp.float32):
    return ResNet(Bottleneck, (3, 4, 6, 3), dtype=dtype)


def resnet101(dtype=jnp.float32):
    return ResNet(Bottleneck, (3, 4, 23, 3), dtype=dtype)
