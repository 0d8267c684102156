"""ConvNeXt backbone (NHWC, flax.linen).

The reference uses timm's convnext_base with features_only/out_indices=(3,)
(network/backbone.py:36-46): stride-32, 1024-channel final feature map.
This is a from-scratch NHWC implementation of the published ConvNeXt
architecture (Liu et al., CVPR 2022): 4x4/4 patchify stem, stages of
[depthwise 7x7 -> LN -> 1x1 (4x) -> GELU -> 1x1] blocks with layer scale
and stochastic depth, LN+2x2/2 downsample between stages.

TPU notes: NHWC keeps channels on the 128-lane axis; the 1x1 expansions are
plain matmuls on the MXU; depthwise 7x7 runs on the VPU.  ``dtype``
selects bf16 compute with f32 params.  A timm-checkpoint converter lives in
``givepose_tpu.models.convert_weights`` for loading ImageNet weights.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class _DenseParams(nn.Module):
    """Parameter holder with an nn.Dense-identical tree (kernel, bias)
    so the fused int8 MLP kernel serves unmodified checkpoints."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    drop_path_rate: float = 0.0
    gelu_exact: bool = False
    # int8 W8A8 serving mode for the 1x1 matmuls (models/quant.py);
    # param tree is unchanged, so trained checkpoints serve directly
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        w = self.param("dw_kernel", nn.initializers.lecun_normal(),
                       (7, 7, self.dim), jnp.float32)
        b = self.param("dw_bias", nn.initializers.zeros,
                       (self.dim,), jnp.float32)
        g = self.param("dw_ln_scale", nn.initializers.ones,
                       (self.dim,), jnp.float32)
        bt = self.param("dw_ln_bias", nn.initializers.zeros,
                        (self.dim,), jnp.float32)
        act = "gelu_exact" if self.gelu_exact else "gelu_tanh"
        gamma_init = nn.initializers.constant(self.layer_scale_init)
        if self.quant:
            # inference-only: jnp.round's gradient is zero (training
            # would silently stop updating the MLP weights) and the
            # fused kernel skips stochastic depth
            assert deterministic, (
                "quant=True is an int8 serving mode; apply with "
                "deterministic=True (training through it is broken)")
            # fused int8 serving path: the whole MLP tail (both matmuls,
            # GELU, layer scale, residual) is one Pallas kernel — keeping
            # the 4C intermediate in VMEM is what makes int8 pay off.
            # The LN normalize rides the kernel prologue (XLA can fuse
            # only conv + bias + stats here), so the dwconv fusion emits
            # the raw bf16 map plus f32 stats, like it does for a matmul
            # consumer.
            from givepose_tpu.ops.quant_matmul_pallas import \
                convnext_mlp_int8
            yc = jax.lax.conv_general_dilated(
                x, w[:, :, :, None].transpose(0, 1, 3, 2).astype(x.dtype),
                (1, 1), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.dim,
                preferred_element_type=jnp.float32) + b
            mu = yc.mean(-1, keepdims=True)
            d = yc - mu
            rsig = jax.lax.rsqrt((d * d).mean(-1, keepdims=True) + 1e-6)
            k0, b0 = _DenseParams(4 * self.dim, name="Dense_0")(self.dim)
            k1, b1 = _DenseParams(self.dim, name="Dense_1")(4 * self.dim)
            gamma = self.param("gamma", gamma_init,
                               (self.dim,), jnp.float32)
            return convnext_mlp_int8(yc.astype(self.dtype), residual,
                                     k0, b0, k1, b1, gamma, act=act,
                                     out_dtype=self.dtype,
                                     ln=(mu, rsig, g, bt))
        from givepose_tpu.ops.dwconv_ln import dwconv_ln
        y = dwconv_ln(x, w, b, g, bt)
        y = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="Dense_0")(y)
        y = nn.gelu(y, approximate=not self.gelu_exact)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="Dense_1")(y)
        gamma = self.param("gamma", gamma_init, (self.dim,), jnp.float32)
        y = y * gamma.astype(self.dtype)
        if self.drop_path_rate > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = 1.0 - self.drop_path_rate
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            y = y * mask.astype(self.dtype) / keep
        return residual + y


class ConvNeXt(nn.Module):
    """Features-only ConvNeXt returning the stride-32 stage-3 map."""

    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)
    drop_path_rate: float = 0.0
    # exact erf GELU matches torch/timm (required for ported weights) but
    # costs ~20 ms per ConvNeXt-B forward at batch 64 on v5e
    gelu_exact: bool = False
    quant: bool = False       # see ConvNeXtBlock.quant
    # int8 only pays where K is deep enough for the MXU int8 mode to
    # beat bf16 (v5e sweep: big win at K>=512, loss at K=128/256), so
    # narrow early stages stay bf16
    quant_min_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # stem: patchify 4x4 stride 4 + LN
        y = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv")(x.astype(self.dtype))
        # dtype-native LN: flax computes the stats in f32 internally
        # (one fused pass over the bf16 map); the old f32-in/f32-out
        # wrapper materialized an f32 copy per norm
        y = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, dtype=self.dtype,
                         name="stem_norm")(y)

        total_blocks = sum(self.depths)
        block_idx = 0
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                y = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, dtype=self.dtype,
                                 name=f"downsample_norm{stage}")(y)
                y = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"downsample_conv{stage}")(y)
            for blk in range(depth):
                dp = (self.drop_path_rate * block_idx
                      / max(total_blocks - 1, 1))
                y = ConvNeXtBlock(dim, drop_path_rate=dp,
                                  gelu_exact=self.gelu_exact,
                                  quant=(self.quant
                                         and dim >= self.quant_min_dim),
                                  dtype=self.dtype,
                                  name=f"stage{stage}_block{blk}")(
                    y, deterministic=deterministic)
                block_idx += 1
        return y


def convnext_base(dtype: Dtype = jnp.float32, drop_path_rate: float = 0.0,
                  gelu_exact: bool = False, quant: bool = False) -> ConvNeXt:
    """convnext_base config matching reference backbone.py:36-46."""
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024),
                    drop_path_rate=drop_path_rate, gelu_exact=gelu_exact,
                    quant=quant, dtype=dtype)


def convnext_tiny(dtype: Dtype = jnp.float32, drop_path_rate: float = 0.0,
                  gelu_exact: bool = False, quant: bool = False) -> ConvNeXt:
    """Smaller variant for tests/ablation."""
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                    drop_path_rate=drop_path_rate, gelu_exact=gelu_exact,
                    quant=quant, dtype=dtype)
