"""Fused W8A8 dynamic-quantization matmul Pallas kernel.

Motivation (measured on v5e, M=32768 K=512 N=2048):
  * XLA bf16 matmul        371 us  (185 TFLOP/s, ~94% of the 197 peak)
  * XLA int8 matmul        232 us  (296 TOP/s — the MXU int8 2x path)
  * XLA W8A8 with dynamic quant/dequant as separate elementwise ops:
                           487 us  — SLOWER than bf16: the per-token
    amax/round pass and the f32 dequant epilogue each round-trip HBM.

The only way to bank the int8 MXU rate is to keep quantization inside
the kernel: this kernel loads an (bm, K) activation tile, computes the
per-row amax and int8 quantization IN VMEM (once per row tile, cached in
scratch across the N grid), runs the int8 x int8 -> int32 contraction on
the MXU, and fuses dequant + bias + (optional) GELU into the epilogue.
Weights arrive pre-quantized per output channel (one cheap jnp pass).

The reference has no counterpart (its CUDA path is fp32/fp16); this is
TPU-native serving headroom on top of the ConvNeXt-B backbone whose 1x1
matmuls dominate the PoseNet forward (~21 ms of 42 ms at batch 64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _apply_act(y, act: str):
    if act == "none":
        return y
    if act == "gelu_tanh":
        # tanh GELU (flax approximate=True semantics)
        c = np.sqrt(2.0 / np.pi).astype(np.float32)
        return 0.5 * y * (1.0 + jnp.tanh(c * (y + 0.044715 * y * y * y)))
    if act == "gelu_exact":
        return 0.5 * y * (1.0 + jax.lax.erf(y / np.sqrt(2.0)))
    raise ValueError(f"unknown act {act!r}")


def _qmm_kernel(x_ref, wq_ref, ws_ref, b_ref, o_ref, xq_ref, xs_ref,
                *, act: str, out_dtype):
    """Grid (M/bm, N/bn); x tile re-used (and re-quantized once) per row."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _quantize_rows():
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        xs = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        xq_ref[:] = jnp.round(xf / xs).astype(jnp.int8)
        xs_ref[:] = xs

    acc = jax.lax.dot_general(
        xq_ref[:], wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]
    y = y + b_ref[:]
    # keep the activation in f32: a bf16 GELU measured SLOWER in Mosaic
    # (block bench 1403 vs 1270 us — transcendentals upcast internally,
    # so the bf16 round-trip only adds converts)
    o_ref[:] = _apply_act(y, act).astype(out_dtype)


def _qmm_pre_kernel(xq_ref, xs_ref, wq_ref, ws_ref, b_ref, o_ref,
                    *, act: str, out_dtype):
    """Pre-quantized variant: x arrives int8 (+ per-row scales), so the
    kernel's VPU budget is only the dequant epilogue — the block-level
    profile showed the in-kernel f32 quantize+GELU made the fused kernel
    VPU-bound (~15 us VPU vs 5.4 us MXU per grid step), wiping out the
    int8 MXU win.  The epilogue GELU runs in bf16 (2 lanes/op on the
    VPU; matches the XLA bf16 path's own GELU precision)."""
    acc = jax.lax.dot_general(
        xq_ref[:], wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:] + b_ref[:]
    y = y.astype(jnp.bfloat16)
    o_ref[:] = _apply_act(y, act).astype(out_dtype)


def quant_matmul_pallas(x, wq, w_scale, bias=None, act: str = "none",
                        out_dtype=jnp.bfloat16, bm: int | None = None,
                        bn: int | None = None, interpret: bool = False,
                        vmem_limit_bytes: int = 100 * 1024 * 1024):
    """(M, K) float x (K, N) int8 -> (M, N) with fused dynamic act quant.

    wq: int8 weights, w_scale: (N,) f32 dequant scale (may fold layer
    scale), bias: (N,) f32 or None, act: none|gelu_tanh|gelu_exact.

    Default tiles come from a v5e sweep (M=32768 K=512 N=2048): int8
    MXU hits 365 TOP/s at (bm=1024, bn=2048) vs 296 at (512, 1024);
    bm shrinks at K=4096 to keep the x tile + int8 scratch in VMEM.
    """
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2, (x.shape, wq.shape)
    if bm is None:
        bm = 1024 if k <= 2048 else 512
    if bn is None:
        bn = 2048
    bm = min(bm, _round_up(m, 32))
    bn = min(bn, _round_up(n, 128))
    m_pad = _round_up(m, bm)
    n_pad = _round_up(n, bn)
    k_pad = _round_up(k, 128)      # zero K-pad is exact
    if m_pad != m or k_pad != k:
        x = jnp.pad(x, ((0, m_pad - m), (0, k_pad - k)))
    if n_pad != n or k_pad != k:
        wq = jnp.pad(wq, ((0, k_pad - k), (0, n_pad - n)))
    ws = jnp.pad(w_scale.astype(jnp.float32), (0, n_pad - n))[None, :]
    b = (jnp.zeros((n_pad,), jnp.float32) if bias is None
         else jnp.pad(bias.astype(jnp.float32), (0, n_pad - n)))[None, :]

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, act=act, out_dtype=out_dtype),
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[
            pl.BlockSpec((bm, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k_pad), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_pad * n_pad,
            bytes_accessed=m_pad * k_pad * 2 + k_pad * n_pad
            + m_pad * n_pad * 2,
            transcendentals=m_pad * n_pad if act != "none" else 0),
        interpret=interpret,
    )(x, wq, ws, b)
    return out[:m, :n]


def quant_matmul_pre_pallas(xq, x_scale, wq, w_scale, bias=None,
                            act: str = "none", out_dtype=jnp.bfloat16,
                            bm: int | None = None, bn: int | None = None,
                            interpret: bool = False,
                            vmem_limit_bytes: int = 100 * 1024 * 1024):
    """(M, K) int8 x (K, N) int8 -> (M, N); activations pre-quantized.

    The XLA-side quantize fuses into the producing op (LN / previous
    GELU epilogue) and halves the activation HBM read to int8; see
    ``_qmm_pre_kernel`` for why quantization must not live in-kernel.
    """
    m, k = xq.shape
    k2, n = wq.shape
    assert k == k2, (xq.shape, wq.shape)
    if bm is None:
        bm = 1024 if k <= 2048 else 512
    if bn is None:
        bn = 2048
    bm = min(bm, _round_up(m, 32))
    bn = min(bn, _round_up(n, 128))
    m_pad = _round_up(m, bm)
    n_pad = _round_up(n, bn)
    k_pad = _round_up(k, 128)
    if m_pad != m or k_pad != k:
        xq = jnp.pad(xq, ((0, m_pad - m), (0, k_pad - k)))
    xs = jnp.pad(x_scale.astype(jnp.float32).reshape(m, 1),
                 ((0, m_pad - m), (0, 0)), constant_values=1.0)
    if n_pad != n or k_pad != k:
        wq = jnp.pad(wq, ((0, k_pad - k), (0, n_pad - n)))
    ws = jnp.pad(w_scale.astype(jnp.float32), (0, n_pad - n))[None, :]
    b = (jnp.zeros((n_pad,), jnp.float32) if bias is None
         else jnp.pad(bias.astype(jnp.float32), (0, n_pad - n)))[None, :]

    out = pl.pallas_call(
        functools.partial(_qmm_pre_kernel, act=act, out_dtype=out_dtype),
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[
            pl.BlockSpec((bm, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_pad * n_pad,
            bytes_accessed=m_pad * k_pad + k_pad * n_pad
            + m_pad * n_pad * 2,
            transcendentals=m_pad * n_pad if act != "none" else 0),
        interpret=interpret,
    )(xq, xs, wq, ws, b)
    return out[:m, :n]


def _mlp_core(yf, res_ref, w0_ref, s0_ref, b0_ref, w1_ref, s1_ref,
              b1_ref, o_ref, act, out_dtype):
    xs = jnp.maximum(jnp.max(jnp.abs(yf), axis=1, keepdims=True),
                     1e-8) * (1.0 / 127.0)
    yq = jnp.round(yf / xs).astype(jnp.int8)
    acc0 = jax.lax.dot_general(
        yq, w0_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h = acc0.astype(jnp.float32) * xs * s0_ref[:] + b0_ref[:]
    h = _apply_act(h, act)
    hs = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True),
                     1e-8) * (1.0 / 127.0)
    hq = jnp.round(h / hs).astype(jnp.int8)
    acc1 = jax.lax.dot_general(
        hq, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = (res_ref[:].astype(jnp.float32)
           + acc1.astype(jnp.float32) * hs * s1_ref[:] + b1_ref[:])
    o_ref[:] = out.astype(out_dtype)


def _mlp_kernel(y_ref, res_ref, w0_ref, s0_ref, b0_ref, w1_ref, s1_ref,
                b1_ref, o_ref, *, act: str, out_dtype):
    """Whole ConvNeXt-MLP tail in one kernel: quant -> int8 dot ->
    dequant+GELU -> requant -> int8 dot -> dequant(+layer-scale) ->
    +residual.  The (bm, 4C) intermediate lives only in VMEM — in the
    two-kernel form its HBM write+read plus the XLA-side gamma/residual
    pass cost ~300 us/block and erased the int8 MXU win."""
    _mlp_core(y_ref[:].astype(jnp.float32), res_ref, w0_ref, s0_ref,
              b0_ref, w1_ref, s1_ref, b1_ref, o_ref, act, out_dtype)


def _mlp_ln_kernel(y_ref, mu_ref, rsig_ref, lg_ref, lb_ref, res_ref,
                   w0_ref, s0_ref, b0_ref, w1_ref, s1_ref, b1_ref, o_ref,
                   *, act: str, out_dtype):
    """LN-prologue variant: input is the RAW dwconv output plus its
    per-position mean / rsqrt(var) and channel affine.  XLA fuses the LN
    normalize into a matmul consumer's prologue, but cannot fuse into a
    pallas call — recovering that fusion here removes a full M x C
    normalize materialization (~180 us/block at stage-2 batch 128)."""
    yf = y_ref[:].astype(jnp.float32)
    yf = (yf - mu_ref[:]) * rsig_ref[:] * lg_ref[:] + lb_ref[:]
    _mlp_core(yf, res_ref, w0_ref, s0_ref, b0_ref, w1_ref, s1_ref,
              b1_ref, o_ref, act, out_dtype)


def convnext_mlp_int8(y, residual, w0, b0, w1, b1, gamma,
                      act: str = "gelu_tanh", out_dtype=jnp.bfloat16,
                      bm: int | None = None, interpret: bool = False,
                      ln=None,
                      vmem_limit_bytes: int = 100 * 1024 * 1024):
    """Fused int8 ConvNeXt MLP: out = residual + gamma * (GELU(y@w0+b0)@w1+b1).

    y/residual: (..., C) float; w0 (C, H), w1 (H, C) f32 master weights
    (quantized per output channel in-graph); gamma (C,) layer scale.
    ``ln=(mu, rsig, ln_gamma, ln_beta)`` switches to the LN-prologue
    kernel: y is then the RAW dwconv output and the kernel applies
    ``(y - mu) * rsig * ln_gamma + ln_beta`` before quantizing (mu/rsig
    per position (..., 1), affine per channel (C,)).
    """
    lead = y.shape[:-1]
    c = y.shape[-1]
    hdim = w0.shape[-1]
    y2 = y.reshape(-1, c)
    r2 = residual.reshape(-1, c)
    m = y2.shape[0]
    if bm is None:
        bm = 512 if c <= 512 else 256
    bm = min(bm, _round_up(m, 32))
    m_pad = _round_up(m, bm)
    if m_pad != m:
        y2 = jnp.pad(y2, ((0, m_pad - m), (0, 0)))
        r2 = jnp.pad(r2, ((0, m_pad - m), (0, 0)))
    w0q, s0 = quantize_weights(w0)
    w1q, s1 = quantize_weights(w1, gamma)
    b1g = (b1.astype(jnp.float32) * gamma.astype(jnp.float32))
    if ln is not None:
        mu, rsig, ln_g, ln_b = ln
        mu2 = jnp.pad(mu.reshape(-1, 1).astype(jnp.float32),
                      ((0, m_pad - m), (0, 0)))
        rs2 = jnp.pad(rsig.reshape(-1, 1).astype(jnp.float32),
                      ((0, m_pad - m), (0, 0)), constant_values=1.0)

    on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu or interpret):
        # XLA formulation for CPU CI — identical math, unfused
        yf = y2.astype(jnp.float32)
        if ln is not None:
            yf = ((yf - mu2) * rs2 * ln_g.astype(jnp.float32)
                  + ln_b.astype(jnp.float32))

        def qmm(xf, wq, ws):
            xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                             1e-8) / 127.0
            xq = jnp.round(xf / xs).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * xs * ws
        h = _apply_act(qmm(yf, w0q, s0) + b0.astype(jnp.float32), act)
        out = r2.astype(jnp.float32) + qmm(h, w1q, s1) + b1g
        return out[:m].astype(out_dtype).reshape(*lead, c)

    row_spec = pl.BlockSpec((bm, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col1_spec = pl.BlockSpec((bm, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    chan_spec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    weight_specs = [
        pl.BlockSpec((c, hdim), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        chan_spec(hdim), chan_spec(hdim),
        pl.BlockSpec((hdim, c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        chan_spec(c), chan_spec(c),
    ]
    weight_args = (w0q, s0[None, :], b0.astype(jnp.float32)[None, :],
                   w1q, s1[None, :], b1g[None, :])
    if ln is None:
        kern = functools.partial(_mlp_kernel, act=act, out_dtype=out_dtype)
        in_specs = [row_spec, row_spec] + weight_specs
        call_args = (y2, r2) + weight_args
    else:
        kern = functools.partial(_mlp_ln_kernel, act=act,
                                 out_dtype=out_dtype)
        in_specs = ([row_spec, col1_spec, col1_spec, chan_spec(c),
                     chan_spec(c), row_spec] + weight_specs)
        call_args = (y2, mu2, rs2,
                     ln_g.astype(jnp.float32)[None, :],
                     ln_b.astype(jnp.float32)[None, :], r2) + weight_args

    out = pl.pallas_call(
        kern,
        grid=(m_pad // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * c * hdim,
            bytes_accessed=m_pad * c * 6 + 2 * c * hdim,
            transcendentals=m_pad * hdim),
        interpret=interpret,
    )(*call_args)
    return out[:m].reshape(*lead, c)


def quantize_activations(x):
    """Per-row symmetric int8: (..., K) -> (int8 (..., K), f32 (..., 1)).
    Pure XLA so it fuses into the producer's epilogue."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    return xq, xs


def quantize_weights(w, gamma=None):
    """Per-output-channel symmetric int8; optionally folds a layer-scale
    vector gamma (N,) into the dequant scale."""
    wf = w.astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
    wq = jnp.round(wf / ws).astype(jnp.int8)
    if gamma is not None:
        ws = ws * gamma.astype(jnp.float32)
    return wq, ws


def quant_dense(x, w, bias=None, act: str = "none", gamma=None,
                out_dtype=jnp.bfloat16, interpret: bool = False):
    """N-D wrapper: (..., K) x (K, N) fused W8A8 dense with optional
    activation.  Falls back to an XLA formulation off-TPU (tests run the
    CPU mesh; Mosaic int8 needs real hardware)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w.shape[-1]
    x2 = x.reshape(-1, k)
    on_tpu = jax.devices()[0].platform == "tpu"
    wq, ws = quantize_weights(w, gamma)
    if on_tpu or interpret:
        # quantize INSIDE the kernel: an XLA-side quantize cannot fuse
        # into a conv/dot producer or the pallas custom-call consumer,
        # so it materializes as its own HBM pass (block bench: 1924 us
        # vs 1270 in-kernel)
        y = quant_matmul_pallas(x2, wq, ws, bias=bias, act=act,
                                out_dtype=out_dtype, interpret=interpret)
    else:
        # XLA reference path (slower: unfused quant/dequant) — exact same
        # math, used on CPU CI and as the correctness oracle
        xf = x2.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-8) / 127.0
        xq = jnp.round(xf / xs).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * xs * ws
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        y = _apply_act(y, act).astype(out_dtype)
    return y.reshape(*lead, n)
