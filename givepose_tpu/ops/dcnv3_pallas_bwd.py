"""Pallas backward kernel for DCNv3.

The separable forward (ops.dcnv3_pallas) is matmuls + elementwise, so its
transpose is too — no scatter needed, unlike the reference's six CUDA
col2im kernels (dcnv3_im2col_cuda.cuh:286-818):

  forward:  rmix = img @ eyt ; prod = rmix * wxf ; out = smat @ prod
  backward: dprod = smat^T @ dout_tiled
            drmix = dprod * wxf          -> dimg  = drmix @ eyt^T
            dwxf  = dprod * rmix         -> dwx   = sx @ dwxf
            deyt  = img^T @ drmix (as einsum contracting rows)
            dwy/dwx weights extracted with the same 2-hot compares.

Gradients w.r.t. the raw (x, offset, mask) arguments flow through the
differentiable XLA prep (jax.vjp of _prepare_inputs), where floor() has
zero gradient and fx = ix - floor(ix) passes d(ix) straight through —
matching the reference autograd semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from givepose_tpu.ops.dcnv3_pallas import _prepare_inputs, _round_up


def _dcnv3_bwd_kernel(img_ref, aux_ref, dout_ref, dimg_ref, daux_ref,
                      rmix_ref, drmix_ref, *, dims, tap_chunk):
    """One (n, g, pixel-tile) step of the backward pass.

    Blocks:
      img_ref:  (1, 1, rows, K)     forward input slab
      aux_ref:  (1, 1, 8, P, T)     forward aux (indices + weights)
      dout_ref: (1, 1, gc, T)       upstream gradient
      dimg_ref: (1, 1, rows, K)     accumulated over the pixel-tile axis
      daux_ref: (1, 1, 8, P, T)     weight gradients (index slots zero)
      rmix/drmix: (rows, tap_chunk*T) scratch
    """
    gc = dims["gc"]
    p = dims["p"]
    w_in = dims["w_in"]
    h_pad = dims["h_pad"]
    t = dims["pix_tile"]
    rows = gc * w_in

    img = img_ref[0, 0]
    dout = dout_ref[0, 0].astype(jnp.float32)        # (gc, T)

    @pl.when(pl.program_id(2) == 0)
    def _():
        dimg_ref[0, 0] = jnp.zeros_like(dimg_ref[0, 0])

    # static segment matrices
    r_row = jax.lax.broadcasted_iota(jnp.int32, (gc, rows), 1)
    r_c = jax.lax.broadcasted_iota(jnp.int32, (gc, rows), 0)
    smat = (r_row // w_in == r_c).astype(jnp.float32)      # (gc, rows)
    x_row = jax.lax.broadcasted_iota(jnp.int32, (w_in, rows), 1)
    x_x = jax.lax.broadcasted_iota(jnp.int32, (w_in, rows), 0)
    sx = (x_row % w_in == x_x).astype(jnp.float32)         # (w_in, rows)

    dimg_acc = jnp.zeros((rows, h_pad), jnp.float32)
    n_chunks = -(-p // tap_chunk)
    for ch in range(n_chunks):
        taps = range(ch * tap_chunk, min((ch + 1) * tap_chunk, p))
        nt = len(taps)
        lanes = nt * t

        def lanes_of(k, rows_n):
            return jnp.concatenate(
                [jnp.broadcast_to(aux_ref[0, 0, k, tp:tp + 1, :],
                                  (rows_n, t)) for tp in taps], axis=1)

        iota_y = jax.lax.broadcasted_iota(jnp.int32, (h_pad, lanes),
                                          0).astype(jnp.float32)
        y0a = lanes_of(0, h_pad)
        y0b = lanes_of(1, h_pad)
        wy0 = lanes_of(2, h_pad)
        wy1 = lanes_of(3, h_pad)
        hot_y0 = (iota_y == y0a).astype(jnp.float32)
        hot_y1 = (iota_y == y0b).astype(jnp.float32)
        eyt = hot_y0 * wy0 + hot_y1 * wy1                   # (K, lanes)

        iota_x = jax.lax.broadcasted_iota(jnp.int32, (w_in, lanes),
                                          0).astype(jnp.float32)
        x0a = lanes_of(4, w_in)
        x0b = lanes_of(5, w_in)
        wx0 = lanes_of(6, w_in)
        wx1 = lanes_of(7, w_in)
        hot_x0 = (iota_x == x0a).astype(jnp.float32)
        hot_x1 = (iota_x == x0b).astype(jnp.float32)
        wx = hot_x0 * wx0 + hot_x1 * wx1                    # (w_in, lanes)
        wx_full = pltpu.repeat(wx, gc, axis=0)              # (rows, lanes)

        # recompute rmix (cheaper than caching it through HBM)
        rmix_ref[:, :lanes] = jnp.dot(img, eyt,
                                      preferred_element_type=jnp.float32)

        # dprod: upstream grad replicated to every tap lane-slice
        dout_lanes = jnp.concatenate([dout] * nt, axis=1)   # (gc, lanes)
        dprod = jnp.dot(smat.T, dout_lanes,
                        preferred_element_type=jnp.float32)  # (rows, lanes)

        drmix_ref[:, :lanes] = dprod * wx_full

        # dimg += drmix @ eyt^T : contract lanes
        dimg_acc = dimg_acc + jax.lax.dot_general(
            drmix_ref[:, :lanes], eyt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (rows, K)

        # deyt = img^T @ drmix : contract rows
        deyt = jax.lax.dot_general(
            img, drmix_ref[:, :lanes],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (K, lanes)
        dwy0_l = jnp.sum(hot_y0 * deyt, axis=0,
                         keepdims=True)                     # (1, lanes)
        dwy1_l = jnp.sum(hot_y1 * deyt, axis=0, keepdims=True)

        # dwx = sum over channel blocks of dprod*rmix
        dwx_full = dprod * rmix_ref[:, :lanes]
        dwx = jnp.dot(sx, dwx_full,
                      preferred_element_type=jnp.float32)   # (w_in, lanes)
        dwx0_l = jnp.sum(hot_x0 * dwx, axis=0, keepdims=True)
        dwx1_l = jnp.sum(hot_x1 * dwx, axis=0, keepdims=True)

        for i, tp in enumerate(taps):
            lo, hi = i * t, (i + 1) * t
            daux_ref[0, 0, 2, tp:tp + 1, :] = dwy0_l[:, lo:hi]
            daux_ref[0, 0, 3, tp:tp + 1, :] = dwy1_l[:, lo:hi]
            daux_ref[0, 0, 6, tp:tp + 1, :] = dwx0_l[:, lo:hi]
            daux_ref[0, 0, 7, tp:tp + 1, :] = dwx1_l[:, lo:hi]

    # index slots carry no gradient
    zeros_row = jnp.zeros((1, p, t), jnp.float32)
    for k in (0, 1, 4, 5):
        daux_ref[0, 0, k] = zeros_row[0]

    dimg_ref[0, 0] = dimg_ref[0, 0] + dimg_acc


def dcnv3_pallas_bwd(img_t, aux, dout_maps, dims, tap_chunk=2,
                     vmem_limit_bytes=100 * 1024 * 1024,
                     interpret=False):
    """Run the backward kernel.

    Args:
      img_t: (N, G, rows, K) forward slab.
      aux: (N, G, 8, P, Q_pad) forward aux.
      dout_maps: (N, G, gc, Q_pad) upstream grads in kernel layout.

    Returns (d_img_t, d_aux) with the same shapes as the inputs.
    """
    n, group, rows, k = img_t.shape
    p = dims["p"]
    t = dims["pix_tile"]
    n_tiles = dims["n_tiles"]

    d_img, d_aux = pl.pallas_call(
        functools.partial(_dcnv3_bwd_kernel, dims=dims,
                          tap_chunk=tap_chunk),
        grid=(n, group, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, rows, k), lambda i, g, q: (i, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, p, t), lambda i, g, q: (i, g, 0, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dims["gc"], t),
                         lambda i, g, q: (i, g, 0, q),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, rows, k), lambda i, g, q: (i, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, p, t),
                         lambda i, g, q: (i, g, 0, 0, q),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(img_t.shape, jnp.float32),
            jax.ShapeDtypeStruct(aux.shape, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, tap_chunk * t), jnp.float32),
            pltpu.VMEM((rows, tap_chunk * t), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(img_t, aux, dout_maps)
    return d_img, d_aux
