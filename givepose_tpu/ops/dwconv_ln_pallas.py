"""Depthwise-7x7-conv + LayerNorm: production XLA formulation + an
exploratory fused Pallas kernel (measured SLOWER — kept for the record).

``_dwconv_ln_xla`` is the PRODUCTION implementation used by
ConvNeXtBlock: one expression so XLA fuses conv (f32 accumulation), bias,
LN stats, and the affine into its conv epilogue.  Replaces the
reference's nn.Conv2d(groups=dim) + LayerNorm pair (timm ConvNeXt block;
reference network/backbone.py:36-46 pulls the timm model).  Switching the
flax nn.Conv/nn.LayerNorm pair to this form cut the ConvNeXt-B forward
from 34.1 to 32.6 ms @ batch 64 bf16 on v5e.

The Pallas kernel (``dwconv_ln_pallas``) computes the same thing as 49
shifted VPU FMAs + lane-axis LN in one VMEM pass.  v5e measurements
(batch 64, per single layer / summed over ConvNeXt-B):
    XLA:    1.06/0.42/0.11/0.06 ms by stage  -> 7.6 ms total
    Pallas: 1.97/0.95/0.47/0.22 ms (best)    -> 22  ms total
XLA's dedicated convolution engine beats any VPU tap-loop here; the
kernel stays selectable (ConvNeXtBlock dw_impl='pallas') as a recorded
negative result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, g_ref, bt_ref, o_ref, *, th, w, eps):
    """One output row-tile per grid step.

    x_ref: (1, H+6, W+6, C) full padded image, indexed by n only (stays
    resident in VMEM across the h steps); o_ref: (1, TH, W, C).  The
    (TH, W, C) f32 accumulator is register-sized (TH=8 -> 64 vregs at
    W=64, C=128), so the 49 tap FMAs never round-trip VMEM.
    """
    h0 = pl.program_id(1) * th
    acc = jnp.zeros((th, w, x_ref.shape[-1]), jnp.float32)
    for dy in range(7):
        # convert once per row-slab (7 converts, not 49), FMA in f32
        rows = x_ref[0, pl.ds(h0 + dy, th), :, :].astype(jnp.float32)
        for dx in range(7):
            acc = acc + rows[:, dx:dx + w, :] * w_ref[dy, dx, :]
    acc = acc + b_ref[0, :].astype(jnp.float32)
    mu = jnp.mean(acc, axis=-1, keepdims=True)
    d = acc - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    y = d * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0, :].astype(jnp.float32) + bt_ref[0, :].astype(
        jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _dwconv_ln_xla(x, w, b, gamma, beta, eps=1e-6):
    """Reference XLA formulation (grouped conv + f32 LN); the gradient
    source for the custom_vjp and the CPU/interpret fallback."""
    c = x.shape[-1]
    # conv output stays in x.dtype: preferred_element_type=f32 with bf16
    # operands breaks the autodiff transpose rule (f32 cotangent meets
    # the bf16 kernel inside lax's transpose conv, which requires equal
    # dtypes).  TPU still accumulates the taps in f32 internally; only
    # the single output rounding is bf16.
    y = jax.lax.conv_general_dilated(
        x, w[:, :, :, None].transpose(0, 1, 3, 2).astype(x.dtype), (1, 1),
        [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    y = y.astype(jnp.float32) + b
    mu = y.mean(-1, keepdims=True)
    d = y - mu
    var = (d * d).mean(-1, keepdims=True)
    out = d * jax.lax.rsqrt(var + eps) * gamma + beta
    return out.astype(x.dtype)


def dwconv_ln_pallas(x, w, b, gamma, beta, eps=1e-6, row_tile=8,
                     interpret=False):
    """Fused kernel call.  x (N,H,W,C); w (7,7,C); b/gamma/beta (C,)."""
    n, h, ww, c = x.shape
    th = min(row_tile, h)
    assert h % th == 0, (h, th)
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    w8 = jnp.pad(w.astype(jnp.float32), ((0, 1), (0, 1), (0, 0)))
    row = lambda v: v.reshape(1, c).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_kernel, th=th, w=ww, eps=eps),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, h + 6, ww + 6, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, ww, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, ww, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w8, row(b), row(gamma), row(beta))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def dwconv_ln(x, w, b, gamma, beta, eps=1e-6):
    """Fused dwconv7x7+LN with Pallas forward and XLA-autodiff backward."""
    return dwconv_ln_pallas(x, w, b, gamma, beta, eps=eps)


def _fwd(x, w, b, gamma, beta, eps):
    return dwconv_ln_pallas(x, w, b, gamma, beta, eps=eps), \
        (x, w, b, gamma, beta)


def _bwd(eps, res, g):
    x, w, b, gamma, beta = res
    _, vjp = jax.vjp(
        lambda *a: _dwconv_ln_xla(*a, eps=eps), x, w, b, gamma, beta)
    return vjp(g)


dwconv_ln.defvjp(_fwd, _bwd)
