"""Pallas TPU kernel for the DCNv3 forward pass.

Replaces the reference CUDA im2col kernel (network/ops_dcnv3/src/cuda/
dcnv3_im2col_cuda.cuh:217) — and, more importantly, the XLA-gather
formulation in ``givepose_tpu.ops.dcnv3``, which lowers to a serial
per-row gather loop on TPU (~60 ms per MAPEncoder layer at batch 64).

TPU has no general gather (Mosaic's ``tpu.dynamic_gather`` only permutes
within one vreg), so the bilinear sampling is decomposed into dense ops:

  stage A (MXU):  the y-interpolation of every query is a 2-hot matmul
                  ``RmixT = Img_T @ EyT`` where Img_T is the padded input
                  laid out ((channel, x), y) and EyT (y, query) carries the
                  two bilinear y-weights of each query;
  stage B (VPU):  the x-interpolation multiplies RmixT ((c,x), query) by a
                  2-hot x-weight map (x, query) tiled across channels with
                  ``pltpu.repeat`` (tile semantics), then segment-reduces
                  over x and over the kernel taps.

Queries live on the lane axis (128 output pixels per grid step, kernel
taps batched in lane chunks), so both stages are full-width vector/matrix
ops with zero irregular memory traffic.

Backward uses the differentiable XLA formulation via ``jax.custom_vjp``
(scatter-add transpose is not expressible in Mosaic yet); the kernel
accelerates inference and the forward pass of training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from givepose_tpu.ops.dcnv3 import dcnv3_core, dcnv3_sampling_locations


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _static_dims(x_shape, offset_shape, kernel, pad, group,
                 pix_tile_max=128, k_align=128):
    """Shape-only version of the dims dict ``_prepare_inputs`` returns."""
    n, h, w_sp, c_total = x_shape
    _, h_out, w_out, _ = offset_shape
    gc = c_total // group
    p = kernel * kernel
    h_in, w_in = h + 2 * pad, w_sp + 2 * pad
    q_pix = h_out * w_out
    pix_tile = min(pix_tile_max, q_pix)
    n_tiles = -(-q_pix // pix_tile)
    return dict(gc=gc, p=p, w_in=w_in, h_pad=_round_up(h_in, k_align),
                q_pix=q_pix, pix_tile=pix_tile, n_tiles=n_tiles,
                h_out=h_out, w_out=w_out, group=group)


def _prepare_inputs(x, offset, mask, kernel, stride, pad, dilation, group,
                    offset_scale, pix_tile_max=128, k_major=False,
                    k_align=128, window=0):
    """XLA-side prep: transposed slab + per-query integer/frac coords.

    ``k_major=False`` lays the slab out as (rows=(c,x), y-K) — used by the
    backward kernel; ``k_major=True`` puts K (the y axis) on sublanes with
    only ``k_align`` padding, halving the forward stage-A MXU waste
    (K 66 -> 72 instead of 128)."""
    n, h, w_sp, c_total = x.shape
    gc = c_total // group
    p = kernel * kernel
    _, h_out, w_out, _ = offset.shape
    h_in, w_in = h + 2 * pad, w_sp + 2 * pad
    q_pix = h_out * w_out

    x_pad = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h_pad = _round_up(h_in, k_align)
    if k_major:
        # Img_K[n, g, y, c*W_in + x]
        img_t = (x_pad.reshape(n, h_in, w_in, group, gc)
                 .transpose(0, 3, 1, 4, 2)      # (n, g, H_in, gc, W_in)
                 .reshape(n, group, h_in, gc * w_in))
        img_t = jnp.pad(img_t,
                        ((0, 0), (0, 0), (0, h_pad - h_in), (0, 0)))
    else:
        # Img_T[n, g, c*W_in + x, y] (c-major rows so the x-weight tile
        # from pltpu.repeat lines up)
        img_t = (x_pad.reshape(n, h_in, w_in, group, gc)
                 .transpose(0, 3, 4, 2, 1)      # (n, g, gc, W_in, H_in)
                 .reshape(n, group, gc * w_in, h_in))
        img_t = jnp.pad(img_t, ((0, 0), (0, 0), (0, 0),
                                (0, h_pad - h_in)))

    loc = dcnv3_sampling_locations(offset, h_in, w_in, kernel, stride,
                                   dilation, group, offset_scale)
    if window > 0:
        from givepose_tpu.ops.dcnv3 import clamp_to_window
        loc = clamp_to_window(loc, h_out, w_out, kernel, stride, dilation,
                              window)
    # (N, Ho, Wo, G, P, 2) -> (N, G, P, Q_pix)
    ix = loc[..., 0].reshape(n, q_pix, group, p).transpose(0, 2, 3, 1)
    iy = loc[..., 1].reshape(n, q_pix, group, p).transpose(0, 2, 3, 1)
    m = mask.reshape(n, q_pix, group, p).transpose(0, 2, 3, 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = (ix - x0).astype(jnp.float32)
    fy = (iy - y0).astype(jnp.float32)

    # out-of-bounds corners contribute zero; clamp indices for safe compare
    y0v = ((y0 >= 0) & (y0 < h_in)).astype(jnp.float32)
    y1v = ((y0 + 1 >= 0) & (y0 + 1 < h_in)).astype(jnp.float32)
    x0v = ((x0 >= 0) & (x0 < w_in)).astype(jnp.float32)
    x1v = ((x0 + 1 >= 0) & (x0 + 1 < w_in)).astype(jnp.float32)

    # clamp EACH corner separately: clamping the base index must not
    # shift the second corner's row/column compare
    y0a = jnp.clip(y0, 0, h_in - 1)
    y0b = jnp.clip(y0 + 1, 0, h_in - 1)
    x0a = jnp.clip(x0, 0, w_in - 1)
    x0b = jnp.clip(x0 + 1, 0, w_in - 1)

    wy0 = (1.0 - fy) * y0v
    wy1 = fy * y1v
    wx0 = (1.0 - fx) * x0v * m
    wx1 = fx * x1v * m

    pix_tile = min(pix_tile_max, q_pix)
    n_tiles = -(-q_pix // pix_tile)
    pad_q = n_tiles * pix_tile - q_pix

    def padq(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad_q)))

    aux = [padq(a.astype(jnp.float32))
           for a in (y0a, y0b, wy0, wy1, x0a, x0b, wx0, wx1)]
    aux = jnp.stack(aux, axis=2)   # (N, G, 8, P, Q_pad)

    dims = _static_dims(x.shape, offset.shape, kernel, pad, group,
                        pix_tile_max=pix_tile_max, k_align=k_align)
    return img_t, aux, dims


def _dcnv3_kernel(img_ref, aux_ref, o_ref, rmix_ref, *, dims, tap_chunk,
                  compute_dtype=jnp.float32):
    """One (n, g, pixel-tile) step.

    Blocks:
      img_ref:  (1, 1, gc*W_in, H_pad)   transposed input slab
      aux_ref:  (1, 1, 8, P, T)          y0a, y0b, wy0, wy1, x0a, x0b,
                                         wx0, wx1
      o_ref:    (1, 1, gc, T)            output (channels x pixels)
      rmix_ref: (gc*W_in, tap_chunk*T)   stage-A scratch
    """
    gc = dims["gc"]
    p = dims["p"]
    w_in = dims["w_in"]
    h_pad = dims["h_pad"]
    t = dims["pix_tile"]

    rows = gc * w_in
    cdt = compute_dtype
    img = img_ref[0, 0].astype(cdt)          # (H_pad-K, gc*W_in) k-major
    acc = jnp.zeros((gc, t), jnp.float32)

    # static segment-sum matrices (Mosaic reshapes across tiles are
    # unsupported, so reductions run on the MXU as 0/1 matmuls):
    #   s_mat (gc, rows):   sums x within each channel block
    s_row = jax.lax.broadcasted_iota(jnp.int32, (gc, rows), 1)
    s_c = jax.lax.broadcasted_iota(jnp.int32, (gc, rows), 0)
    s_mat = (s_row // w_in == s_c).astype(cdt)

    n_chunks = -(-p // tap_chunk)
    for ch in range(n_chunks):
        taps = range(ch * tap_chunk, min((ch + 1) * tap_chunk, p))
        nt = len(taps)
        lanes = nt * t

        def lanes_of(k, rows_n):
            return jnp.concatenate(
                [jnp.broadcast_to(aux_ref[0, 0, k, tp:tp + 1, :],
                                  (rows_n, t)) for tp in taps], axis=1)

        # build EyT (H_pad, lanes): 2-hot y weights per query lane
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (h_pad, lanes),
                                          0).astype(jnp.float32)
        y0a = lanes_of(0, h_pad)
        y0b = lanes_of(1, h_pad)
        wy0 = lanes_of(2, h_pad)
        wy1 = lanes_of(3, h_pad)
        eyt = (jnp.where(iota_y == y0a, wy0, 0.0)
               + jnp.where(iota_y == y0b, wy1, 0.0)).astype(cdt)

        # stage A: y-interpolation on the MXU (f32 accumulation);
        # contraction over K (dim 0 of both) keeps K at 72 not 128
        rmix_ref[:, :lanes] = jax.lax.dot_general(
            img, eyt, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)

        # build Wx (W_in, lanes) 2-hot x weights (mask folded in), tile
        # across channels (c-major rows -> pltpu.repeat tile semantics)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (w_in, lanes),
                                          0).astype(jnp.float32)
        x0a = lanes_of(4, w_in)
        x0b = lanes_of(5, w_in)
        wx0 = lanes_of(6, w_in)
        wx1 = lanes_of(7, w_in)
        wx = (jnp.where(iota_x == x0a, wx0, 0.0)
              + jnp.where(iota_x == x0b, wx1, 0.0)).astype(cdt)
        wx_full = pltpu.repeat(wx, gc, axis=0)        # (gc*W_in, lanes)

        # stage B: weighted x-reduction (segment matmul) + tap-reduction
        prod = rmix_ref[:, :lanes] * wx_full
        red_x = jnp.dot(s_mat, prod,
                        preferred_element_type=jnp.float32)   # (gc, lanes)
        for i in range(nt):
            acc = acc + red_x[:, i * t:(i + 1) * t]

    o_ref[0, 0] = acc


def auto_tiles(x_shape, offset_shape, kernel, pad, group, compute_dtype,
               scratch_budget_bytes, tap_chunk=None, pix_tile_max=None):
    """Deterministic (tap_chunk, pix_tile) selection fitting the stage-A
    scratch into the VMEM budget — shared by forward and backward so the
    aux layouts agree."""
    _, h, w_sp, c_total = x_shape
    _, h_out, w_out, _ = offset_shape
    p_taps = kernel * kernel
    gc_ = c_total // group
    rows_ = gc_ * (w_sp + 2 * pad)
    q_pix_ = h_out * w_out
    elem_bytes = 2 if compute_dtype == jnp.bfloat16 else 4
    if pix_tile_max is None or tap_chunk is None:
        lanes_budget = max(128,
                           scratch_budget_bytes // (rows_ * elem_bytes))
        if pix_tile_max is None:
            pix_tile_max = min(256, max(128, lanes_budget), q_pix_)
        if tap_chunk is None:
            tap_chunk = min(p_taps,
                            max(1, lanes_budget // min(pix_tile_max,
                                                       q_pix_)))
    return tap_chunk, pix_tile_max


def dcnv3_pallas(x, offset, mask, kernel=3, stride=1, pad=1, dilation=1,
                 group=4, offset_scale=1.0, interpret=False,
                 tap_chunk=None, pix_tile_max=None,
                 scratch_budget_bytes=6 * 1024 * 1024,
                 compute_dtype=jnp.float32,
                 vmem_limit_bytes=100 * 1024 * 1024):
    """DCNv3 forward via the separable Pallas kernel.  NHWC.

    Contract identical to ``dcnv3_core`` / reference dcnv3_core_pytorch:
    x (N,H,W,G*C), offset (N,Ho,Wo,G*P*2), mask (N,Ho,Wo,G*P)
    -> (N,Ho,Wo,G*C) f32.

    ``compute_dtype=bfloat16`` halves the stage-B vector work and the
    scratch; MXU input rounding is bf16 either way on TPU, so the relative
    error vs the f32 XLA core stays ~1e-2.  The f32 default keeps the op
    contract exact; the model path (dcnv3_fast) selects bf16.
    """
    n, h, w_sp, c_total = x.shape
    _, h_out, w_out, _ = offset.shape
    tap_chunk, pix_tile_max = auto_tiles(
        x.shape, offset.shape, kernel, pad, group, compute_dtype,
        scratch_budget_bytes, tap_chunk, pix_tile_max)
    k_align = 16 if compute_dtype == jnp.bfloat16 else 8
    img_t, aux, dims = _prepare_inputs(
        x.astype(jnp.float32), offset.astype(jnp.float32),
        mask.astype(jnp.float32), kernel, stride, pad, dilation, group,
        offset_scale, pix_tile_max=pix_tile_max, k_major=True,
        k_align=k_align)
    gc = dims["gc"]
    p = dims["p"]
    t = dims["pix_tile"]
    n_tiles = dims["n_tiles"]
    rows = gc * dims["w_in"]

    out = pl.pallas_call(
        functools.partial(_dcnv3_kernel, dims=dims, tap_chunk=tap_chunk,
                          compute_dtype=compute_dtype),
        grid=(n, group, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, dims["h_pad"], rows),
                         lambda i, g, q: (i, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, p, t),
                         lambda i, g, q: (i, g, 0, 0, q),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, gc, t),
                               lambda i, g, q: (i, g, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, group, gc, n_tiles * t),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, tap_chunk * t), compute_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(img_t, aux)

    # (N, G, gc, Q_pad) -> (N, Ho, Wo, G*gc)
    out = out[..., :dims["q_pix"]]
    out = out.transpose(0, 3, 1, 2).reshape(n, h_out, w_out,
                                            group * gc)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def dcnv3_fast(x, offset, mask, kernel=3, stride=1, pad=1, dilation=1,
               group=4, offset_scale=1.0):
    """DCNv3 with Pallas forward (bf16 compute) and XLA-autodiff
    backward."""
    return dcnv3_pallas(x, offset, mask, kernel, stride, pad, dilation,
                        group, offset_scale,
                        compute_dtype=jnp.bfloat16)


def _fwd(x, offset, mask, kernel, stride, pad, dilation, group,
         offset_scale):
    out = dcnv3_pallas(x, offset, mask, kernel, stride, pad, dilation,
                       group, offset_scale,
                       compute_dtype=jnp.bfloat16)
    return out, (x, offset, mask)


def _bwd(kernel, stride, pad, dilation, group, offset_scale, residuals, g):
    from givepose_tpu.ops.dcnv3_pallas_bwd import dcnv3_pallas_bwd

    x, offset, mask = residuals
    n, h, w_sp, c_total = x.shape
    _, h_out, w_out, _ = offset.shape
    tap_chunk, pix_tile_max = auto_tiles(
        x.shape, offset.shape, kernel, pad, group, jnp.float32,
        6 * 1024 * 1024)

    def prep(a, b, c):
        img_t, aux, _ = _prepare_inputs(
            a.astype(jnp.float32), b.astype(jnp.float32),
            c.astype(jnp.float32), kernel, stride, pad, dilation, group,
            offset_scale, pix_tile_max=pix_tile_max, k_major=False,
            k_align=128)
        return img_t, aux

    (img_t, aux), vjp_prep = jax.vjp(prep, x, offset, mask)
    dims = _static_dims(x.shape, offset.shape, kernel, pad, group,
                        pix_tile_max=pix_tile_max, k_align=128)

    # upstream grad NHWC -> kernel layout (N, G, gc, Q_pad)
    gc = dims["gc"]
    q_pix = dims["q_pix"]
    q_pad = dims["n_tiles"] * dims["pix_tile"]
    gk = (g.astype(jnp.float32)
          .reshape(n, q_pix, group, gc).transpose(0, 2, 3, 1))
    gk = jnp.pad(gk, ((0, 0), (0, 0), (0, 0), (0, q_pad - q_pix)))

    d_img_t, d_aux = dcnv3_pallas_bwd(img_t, aux, gk, dims,
                                      tap_chunk=tap_chunk)
    return vjp_prep((d_img_t, d_aux))


dcnv3_fast.defvjp(_fwd, _bwd)
