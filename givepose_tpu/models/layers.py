"""Shared NN building blocks (flax.linen, NHWC).

Replaces the reference's layer utils (network/torch_utils/layers/*):
ConvModule (conv+GN+act), weight-standardized convs, deconv, DropBlock.
Everything takes a ``dtype`` for bf16 compute with f32 params/norm stats —
the TPU-native mixed-precision recipe.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# init matching the reference's normal_init(std=0.001) for convs / linears
# (network/conv_pnp_net.py:124-134, xyz_head.py:334-347)
def normal_init(std: float = 0.001):
    return nn.initializers.normal(stddev=std)


def get_act(name: str) -> Callable:
    """Reference layer_utils.get_nn_act_func subset."""
    name = name.lower()
    if name == "relu":
        return nn.relu
    if name in ("lrelu", "leaky_relu"):
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    if name == "gelu":
        # tanh approximation: ~2x faster on TPU (erf costs ~20 ms per
        # ConvNeXt-B fwd at batch 64); use 'gelu_exact' to match torch
        # bit-for-bit (needed when porting timm weights)
        return lambda x: nn.gelu(x, approximate=True)
    if name == "gelu_exact":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "silu":
        return nn.silu
    if name == "sigmoid":
        return nn.sigmoid
    if name in ("none", "identity"):
        return lambda x: x
    raise ValueError(f"unknown activation: {name}")


class StdConv(nn.Module):
    """Weight-standardized conv (reference StdConv2d, timm)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, cin, self.features), jnp.float32)
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mean) / jnp.sqrt(var + 1e-10)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class GroupNorm32(nn.Module):
    """GroupNorm with 32 groups in f32 (reference get_norm default 'GN')."""

    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups != 0:
            groups -= 1
        # dtype-native GN: flax reduces the stats in f32 over the bf16
        # input (no f32 materialization); at dtype=f32 this is identical
        # to the old f32-wrapped form.  use_fast_variance=False: the
        # one-pass E[x^2]-mu^2 form cancels catastrophically on
        # large-mean rows (var clamps to 0, rsqrt blowup) — the r3
        # numerics trap that broke the overfit proof in dwconv_ln.
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                            dtype=self.dtype,
                            use_fast_variance=False)(x)


class ConvModule(nn.Module):
    """conv -> GN -> act (reference ConvModule with norm='GN', act='GELU')."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    act: str = "gelu"
    use_ws: bool = False
    num_gn_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if self.use_ws:
            y = StdConv(self.features, (k, k), (self.stride, self.stride),
                        padding=[(k // 2, k // 2)] * 2, dtype=self.dtype)(x)
        else:
            y = nn.Conv(self.features, (k, k), (self.stride, self.stride),
                        padding=[(k // 2, k // 2)] * 2, use_bias=False,
                        kernel_init=normal_init(0.001),
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = GroupNorm32(self.num_gn_groups, dtype=self.dtype)(y)
        return get_act(self.act)(y)


class DeconvModule(nn.Module):
    """ConvTranspose(k=3, s=2) -> GN -> act (reference xyz_head deconv
    block, _get_deconv_pad_outpad(3) => pad 1, output_pad 1)."""

    features: int
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(k=3,s=2,p=1,output_p=1) doubles H,W; the
        # exact equivalent is transpose_kernel=True with lax padding
        # (k-1-p, k-1-p+output_p) = (1,2) — verified to 1e-7 vs torch
        # (kernel layout (kh,kw,out,in), torch weight.transpose(2,3,1,0)).
        y = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             padding=[(1, 2), (1, 2)], use_bias=False,
                             transpose_kernel=True,
                             kernel_init=normal_init(0.001),
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = GroupNorm32(dtype=self.dtype)(y)
        return get_act(self.act)(y)


def upsample_2x(x: jnp.ndarray, method: str = "bilinear") -> jnp.ndarray:
    """2x spatial upsample, NHWC.

    torch nn.UpsamplingBilinear2d uses align_corners=True; jax.image.resize
    has no align_corners mode, so build the separable matrices explicitly.
    """
    n, h, w, c = x.shape
    if method == "nearest":
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    # align_corners=True bilinear: out[i] sampled at i*(h-1)/(2h-1)
    def weight(out_n, in_n):
        pos = jnp.arange(out_n, dtype=jnp.float32) * (in_n - 1) / (out_n - 1)
        i0 = jnp.floor(pos)
        frac = pos - i0
        grid = jnp.arange(in_n, dtype=jnp.float32)
        w0 = (grid == i0[:, None]).astype(jnp.float32) * (1 - frac)[:, None]
        w1 = (grid == (i0 + 1)[:, None]).astype(jnp.float32) * frac[:, None]
        return w0 + w1
    wy = weight(2 * h, h).astype(x.dtype)
    wx = weight(2 * w, w).astype(x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", wy, x)
    return jnp.einsum("pw,nowc->nopc", wx, y)


class DropBlock2D(nn.Module):
    """DropBlock regularizer (reference torch_utils/layers/dropblock.py).

    Inactive when drop_prob == 0 (the reference default on every live
    path); implemented for parity with the LinearScheduler interface —
    ``rate`` is supplied by the caller so scheduling stays functional.
    """

    block_size: int = 5

    @nn.compact
    def __call__(self, x, rate: float = 0.0, deterministic: bool = True):
        # rate may be a traced scalar (LinearScheduler ramp inside jit);
        # only short-circuit on static knowledge
        if deterministic or (isinstance(rate, (int, float)) and rate == 0.0):
            return x
        n, h, w, c = x.shape
        gamma = (rate / self.block_size ** 2) * (
            (h * w) / ((h - self.block_size + 1) * (w - self.block_size + 1)))
        rng = self.make_rng("dropout")
        seed_mask = jax.random.bernoulli(rng, jnp.asarray(gamma),
                                         (n, h, w, c))
        pooled = nn.max_pool(seed_mask.astype(x.dtype),
                             (self.block_size, self.block_size),
                             strides=(1, 1), padding="SAME")
        block_mask = 1.0 - pooled
        keep = jnp.mean(block_mask)
        return x * block_mask * (1.0 / jnp.maximum(keep, 1e-6))
