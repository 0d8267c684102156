"""Fused ConvNeXt block Pallas kernel (exploratory).

One kernel evaluates a whole ConvNeXt block — depthwise 7x7, LayerNorm,
fc1, GELU, fc2, layer-scale, residual — on a VMEM-resident activation
tile.

MEASURED (v5e, batch 64, bf16): XLA's own fusion of the flax block is
already at or below this kernel (stage-3 16x16x512: 0.66 ms unfused vs
0.96 ms fused; stage-2 32x32x256: 1.77 vs 1.58) — XLA pipelines the
depthwise/LN/MLP chain well on TPU.  Kept as a validated starting point
for future scheduling work (e.g. multi-block weight streaming), NOT wired
into the model.

Layout: activations (B, H, W, C) tiled over batch; weights per block are
kernel inputs.  The depthwise conv is 49 shifted multiply-adds over a
spatially padded copy (Mosaic handles static spatial slices; channels stay
on lanes throughout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(x_ref, dww_ref, dwb_ref, lns_ref, lnb_ref, w1_ref,
                  b1_ref, w2_ref, b2_ref, gamma_ref, o_ref, *,
                  bt: int, h: int, w: int, c: int, hidden: int,
                  compute_dtype):
    cdt = compute_dtype
    x = x_ref[:].astype(cdt)                       # (bt, h, w, c)

    # depthwise 7x7 as 49 shifted MACs on a zero-padded copy
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    acc = jnp.zeros_like(x)
    for dy in range(7):
        for dx in range(7):
            wgt = dww_ref[dy, dx, 0, :].astype(cdt)      # (c,)
            acc = acc + xp[:, dy:dy + h, dx:dx + w, :] * wgt
    y = acc + dwb_ref[:].astype(cdt)

    # LayerNorm over channels, f32 stats
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean((y32 - mean) ** 2, axis=-1, keepdims=True)
    y = ((y32 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(cdt)
    y = y * lns_ref[:].astype(cdt) + lnb_ref[:].astype(cdt)

    # MLP on the MXU
    tokens = y.reshape(bt * h * w, c)
    hmid = jnp.dot(tokens, w1_ref[:].astype(cdt),
                   preferred_element_type=jnp.float32)
    hmid = hmid + b1_ref[:].astype(jnp.float32)
    hmid = jax.nn.gelu(hmid, approximate=True).astype(cdt)
    out = jnp.dot(hmid, w2_ref[:].astype(cdt),
                  preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32)

    out = out.reshape(bt, h, w, c) * gamma_ref[:].astype(jnp.float32)
    o_ref[:] = (x_ref[:].astype(jnp.float32) + out).astype(o_ref.dtype)


def convnext_block_fused(x, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2,
                         gamma, batch_tile: int = 8,
                         compute_dtype=jnp.bfloat16,
                         vmem_limit_bytes=100 * 1024 * 1024,
                         interpret=False):
    """Apply one ConvNeXt block.  x (B, H, W, C) -> same shape.

    Weights follow the flax module's shapes: dw_w (7,7,1,C), w1 (C,4C),
    w2 (4C,C), gamma (C,).
    """
    b, h, w, c = x.shape
    hidden = w1.shape[1]
    while b % batch_tile != 0:
        batch_tile -= 1
    grid = (b // batch_tile,)

    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_kernel, bt=batch_tile, h=h, w=w, c=c,
                          hidden=hidden, compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(7, 7, 1, c),
            full(c,),
            full(c,),
            full(c,),
            full(c, hidden),
            full(hidden,),
            full(hidden, c),
            full(c,),
            full(c,),
        ],
        out_specs=pl.BlockSpec((batch_tile, h, w, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(x, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma)
