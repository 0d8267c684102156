"""MobileNetV3-Small feature extractor (NHWC flax).

The reference Scale_net uses two torchvision mobilenet_v3_small towers
(network/scale_net.py:25-29).  This is a from-scratch NHWC implementation
of the published MobileNetV3-Small architecture (Howard et al., ICCV 2019):
hard-swish stem, inverted-residual bottlenecks with squeeze-excitation,
576-channel head conv.  BatchNorm runs in f32 with a mutable
``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


class SqueezeExcite(nn.Module):
    channels: int
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        squeeze = jnp.mean(x, axis=(1, 2))
        h = nn.Dense(_make_divisible(self.channels // self.reduction),
                     dtype=self.dtype, param_dtype=jnp.float32)(squeeze)
        h = nn.relu(h)
        h = nn.Dense(self.channels, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        return x * hard_sigmoid(h)[:, None, None, :]


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class Bneck(nn.Module):
    kernel: int
    exp: int
    out: int
    use_se: bool
    act: str            # "RE" | "HS"
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu if self.act == "RE" else hard_swish
        cin = x.shape[-1]
        h = x
        if self.exp != cin:
            h = nn.Conv(self.exp, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(h)
            h = nn.BatchNorm(use_fast_variance=False, use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32)(
                h.astype(jnp.float32)).astype(self.dtype)
            h = act(h)
        k = self.kernel
        h = nn.Conv(self.exp, (k, k), strides=(self.stride, self.stride),
                    padding=[(k // 2, k // 2)] * 2,
                    feature_group_count=self.exp, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.BatchNorm(use_fast_variance=False, use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(
            h.astype(jnp.float32)).astype(self.dtype)
        h = act(h)
        if self.use_se:
            h = SqueezeExcite(self.exp, dtype=self.dtype)(h)
        h = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = nn.BatchNorm(use_fast_variance=False, use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(
            h.astype(jnp.float32)).astype(self.dtype)
        if self.stride == 1 and cin == self.out:
            h = h + x
        return h


# (kernel, exp, out, SE, act, stride) — mobilenet_v3_small spec
_SMALL_SPEC = [
    (3, 16, 16, True, "RE", 2),
    (3, 72, 24, False, "RE", 2),
    (3, 88, 24, False, "RE", 1),
    (5, 96, 40, True, "HS", 2),
    (5, 240, 40, True, "HS", 1),
    (5, 240, 40, True, "HS", 1),
    (5, 120, 48, True, "HS", 1),
    (5, 144, 48, True, "HS", 1),
    (5, 288, 96, True, "HS", 2),
    (5, 576, 96, True, "HS", 1),
    (5, 576, 96, True, "HS", 1),
]


class MobileNetV3Small(nn.Module):
    """Returns the pooled 576-d feature (avgpool over the head conv)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem")(
            x.astype(self.dtype))
        h = nn.BatchNorm(use_fast_variance=False, use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32, name="stem_bn")(
            h.astype(jnp.float32)).astype(self.dtype)
        h = hard_swish(h)
        for i, spec in enumerate(_SMALL_SPEC):
            h = Bneck(*spec, dtype=self.dtype, name=f"bneck{i}")(
                h, train=train)
        h = nn.Conv(576, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="head")(h)
        h = nn.BatchNorm(use_fast_variance=False, use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32, name="head_bn")(
            h.astype(jnp.float32)).astype(self.dtype)
        h = hard_swish(h)
        return jnp.mean(h, axis=(1, 2))    # (B, 576)
