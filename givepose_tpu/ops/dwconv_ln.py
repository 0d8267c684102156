"""Depthwise-7x7-conv + LayerNorm, fused-by-XLA formulation.

One expression so XLA fuses conv (f32 tap accumulation), bias, one-pass
LN stats, and the affine into its conv epilogue.  Replaces the
reference's nn.Conv2d(groups=dim) + LayerNorm pair (timm ConvNeXt block;
reference network/backbone.py:36-46 pulls the timm model).  Switching
the flax nn.Conv/nn.LayerNorm pair to this form cut the ConvNeXt-B
forward from 34.1 to 32.6 ms @ batch 64 bf16 on v5e.

A hand-written Pallas kernel (49 shifted VPU FMAs + lane-axis LN in one
VMEM pass) was benched at 22 ms summed over ConvNeXt-B vs 7.6 ms for
this formulation — XLA's dedicated convolution engine beats any VPU
tap-loop here — and was culled (r2/r3; see benchmarks/bench_dwconv.py
for the formulation sweep that established it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dwconv_ln(x, w, b, gamma, beta, eps=1e-6):
    """Depthwise 7x7 conv + LayerNorm.  x (N,H,W,C); w (7,7,C); rest (C,).

    The conv output stays in x.dtype: preferred_element_type=f32 with
    bf16 operands breaks the autodiff transpose rule (f32 cotangent meets
    the bf16 kernel inside lax's transpose conv, which requires equal
    dtypes).  TPU still accumulates the taps in f32 internally; only the
    single output rounding is bf16.
    """
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w[:, :, :, None].transpose(0, 1, 3, 2).astype(x.dtype), (1, 1),
        [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    yf = y.astype(jnp.float32) + b
    # two-pass stats (var = E[(x-mu)^2]) on purpose: the one-pass
    # E[x^2]-mu^2 form cancels catastrophically on large-mean rows
    # (max(m2-mu^2, 0) clamps to var=0 -> rsqrt(eps) blowups and a
    # zeroed variance gradient) — it visibly broke the overfit proof's
    # translation learning at f32 while measuring ZERO end-to-end perf
    # win over this form (1550 vs 1549 crops/s @128, 08-17 chip).
    mu = yf.mean(-1, keepdims=True)
    d = yf - mu
    var = (d * d).mean(-1, keepdims=True)
    out = d * jax.lax.rsqrt(var + eps) * gamma + beta
    return out.astype(x.dtype)
