"""Windowed DCNv3 forward: Pallas kernel with a static sampling window.

The unwindowed kernel (``givepose_tpu.ops.dcnv3_pallas``) must contract the
y-interpolation over the FULL padded height for every query-tap lane — the
per-query MXU floor the reference CUDA kernel
(network/ops_dcnv3/src/cuda/dcnv3_im2col_cuda.cuh:217) never pays because
it gathers pointwise.  Clamping every sample to a static ``window`` around
its query (see ``ops.dcnv3.clamp_to_window``) bounds the rows any query
tile can touch, so the kernel contracts over a small slab instead:

  prep (XLA):   pad + transpose the input to a y-major slab
                Img[n, g, y*gc + c, x] and build per-(tap, query) 2-hot
                bilinear aux rows exactly as the unwindowed kernel does —
                but from window-clamped locations;
  stage A (MXU): x-interpolation of all taps of a query-row tile in one
                matmul  Rmix = Slab @ ExT  with ExT (W_pad, P*T) the 2-hot
                x-weights (mask folded in), Slab the ``slab_h`` rows the
                tile's window can reach (dynamic sublane slice at a
                gc-aligned offset);
  stage B (VPU): y-interpolation as a slab_h-unrolled broadcast-FMA —
                slab row y contributes Rmix[y*gc:(y+1)*gc, :] * Ey[y, :]
                (static contiguous sublane slice times a one-row sublane
                broadcast; every add is elementwise, no cross-sublane
                reduction); a static slice-add folds the P tap blocks.
                This replaced two 0/1-structured matmuls (np.repeat
                expansion + segment reduce) that dominated the kernel:
                1060 -> 1206 crops/s end-to-end @128 (same chip/day).

Queries tile by whole output rows (T = TR * W_out <= 128 lanes), so the
slab a tile reaches is ``stride*(TR-1) + 2*window + 3`` rows — 16 instead
of 72 for the MAPEncoder's first layer — and the tap dimension rides the
MXU lanes exactly once per stage instead of multiplying a full-height
contraction.

Backward reuses the unwindowed custom-vjp machinery on window-clamped
locations (gradients through the clamp vanish at the bound, matching
``jnp.clip``), so training under the window is consistent with eval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from givepose_tpu.ops.dcnv3 import (
    clamp_to_window,
    dcnv3_sampling_locations,
)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _win_dims(x_shape, offset_shape, kernel, stride, pad, dilation, group,
              window):
    """Static geometry shared by prep and kernel."""
    n, h, w_sp, c_total = x_shape
    _, h_out, w_out, _ = offset_shape
    gc = c_total // group
    p = kernel * kernel
    h_in, w_in = h + 2 * pad, w_sp + 2 * pad
    half = (dilation * (kernel - 1)) // 2

    # rows per tile: fill the 128 lanes (t = tr*w_out).  Narrower tiles
    # (tr=2 at w_out=32 -> t=64) are rejected by Mosaic's blockspec rule
    # (last block dim must be 128-divisible or match the array dim).
    tr = max(1, min(128 // w_out, h_out))
    t = tr * w_out
    n_tiles = -(-h_out // tr)
    # corner rows a tile can reach: centers span stride*(TR-1), each center
    # reaches [c - window - 1, c + window + 1] after floor/+1
    slab_h = min(stride * (tr - 1) + 2 * window + 3, h_in)
    h_eff = max(h_in, slab_h)
    w_pad = _round_up(w_in, 8)
    return dict(gc=gc, p=p, h_in=h_in, w_in=w_in, h_eff=h_eff,
                w_pad=w_pad, half=half, tr=tr, t=t, n_tiles=n_tiles,
                slab_h=slab_h, h_out=h_out, w_out=w_out, q_pix=h_out * w_out,
                stride=stride, window=window)


def _prepare(x, offset, mask, kernel, stride, pad, dilation, group,
             offset_scale, window, img_dtype, interpret=False):
    """Slab + aux prep (XLA).  Mirrors dcnv3_pallas._prepare_inputs but
    with window-clamped locations and the y-major (y*gc + c, x) layout.

    The img build stays XLA on purpose (measured 08-19, batch-128 L0,
    bf16 input): the pad+reshape+transpose chain costs 1.19 ms — ~1.8x
    the HBM floor — once the input arrives bf16 (the earlier 3.28 ms
    reading was dominated by a f32 round trip the module no longer
    does).  A Pallas pad+transpose kernel (per-y MXU shift-identity
    matmuls, exact numerics) measured 2.91 ms in isolation and e2e
    neutral, so it was culled."""
    n = x.shape[0]
    d = _win_dims(x.shape, offset.shape, kernel, stride, pad, dilation,
                  group, window)
    gc, p = d["gc"], d["p"]
    h_in, w_in, h_eff, w_pad = d["h_in"], d["w_in"], d["h_eff"], d["w_pad"]
    del interpret  # kept for call-site stability; prep has no kernel

    # one pad straight to the kernel's (h_eff, w_pad) geometry (padding
    # h to h_eff before the reshape == padding rows by (h_eff-h_in)*gc
    # after it), converting to the kernel dtype BEFORE the big transpose
    # so the y-major shuffle moves bf16, not f32.
    x_pad = jnp.pad(x, ((0, 0), (pad, pad + h_eff - h_in),
                        (pad, pad + w_pad - w_in),
                        (0, 0))).astype(img_dtype)
    # (N, H_eff, W_pad, G*gc) -> (N, G, H_eff, gc, W_pad) -> rows y-major
    img = (x_pad.reshape(n, h_eff, w_pad, group, gc)
           .transpose(0, 3, 1, 4, 2)
           .reshape(n, group, h_eff * gc, w_pad))

    loc = dcnv3_sampling_locations(offset, h_in, w_in, kernel, stride,
                                   dilation, group, offset_scale)
    loc = clamp_to_window(loc, d["h_out"], d["w_out"], kernel, stride,
                          dilation, window)
    q_pix = d["q_pix"]

    # compact aux: just (iy, ix, mask) per (tap, query) — the kernel
    # derives floor/fraction/validity/clip and the bilinear weights on
    # the VPU, where they are register-resident, instead of this prep
    # materializing 8 precomputed rows through ~15 separate HBM passes.
    # Padding lanes carry m = 0, which zeroes their x-weights in-kernel.
    #
    # Lane layout of a tile's block (3, P*T): column p*T+j is tap p /
    # query j, so the kernel expands each operand to its matmul operand
    # with ONE sublane broadcast instead of P concatenations.  The tile
    # axis must sit OUTSIDE the (3, P*T) block: Mosaic requires the last
    # two block dims to either match the array dims exactly or be
    # (8k, 128k)-divisible, so a (..., 3, n_tiles, P*T) order with a
    # 1-sized n_tiles block is rejected whenever n_tiles > 1.
    #
    # Built with ONE transpose: stack (iy, ix, m) on a new axis of the
    # (N, Q, G, P) layout the loc/mask tensors already have, split Q into
    # (tiles, T) by reshape, then move everything into tile-major order
    # in a single shuffle (three per-component transposes plus a second
    # 6-D tile shuffle measured ~0.4 ms/layer of XLA passes here).
    t, n_tiles = d["t"], d["n_tiles"]
    q_pad = n_tiles * t - q_pix
    comb = jnp.stack([loc[..., 1].reshape(n, q_pix, group, p),
                      loc[..., 0].reshape(n, q_pix, group, p),
                      mask.reshape(n, q_pix, group, p)],
                     axis=-2)                       # (N, Q, G, 3, P)
    comb = jnp.pad(comb.astype(jnp.float32),
                   ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0)))
    aux = (comb.reshape(n, n_tiles, t, group, 3, p)
           .transpose(0, 3, 1, 4, 5, 2)             # (N, G, tiles, 3, P, T)
           .reshape(n, group, n_tiles, 3, p * t))
    return img, aux, d


def _win_kernel(img_ref, aux_ref, o_ref, rmix_ref, *, dims,
                compute_dtype=jnp.bfloat16):
    """One (n, row-tile) step; the group loop is unrolled in-kernel so a
    grid step carries G groups' worth of work (G x fewer grid steps, one
    resident image block per n instead of per (n, g)).

    Blocks:
      img_ref:  (1, G, H_eff*gc, W_pad)  y-major slab, resident per n
      aux_ref:  (1, G, 1, 3, P*T)  (iy, ix, m) rows of this tile (_prepare)
      o_ref:    (1, G, gc, T)
      rmix_ref: (slab_h*gc, P*T) scratch, reused across the group loop
    """
    gc = dims["gc"]
    p = dims["p"]
    t = dims["t"]
    w_pad = dims["w_pad"]
    slab_h = dims["slab_h"]
    group = img_ref.shape[1]
    rows = slab_h * gc
    lanes = p * t
    cdt = compute_dtype

    q = pl.program_id(1)
    c_first = dims["half"] + dims["stride"] * dims["tr"] * q
    y_lo = jnp.clip(c_first - dims["window"] - 1, 0,
                    dims["h_eff"] - slab_h)

    # derive corners / bilinear weights from the compact (iy, ix, m) aux
    # rows at (1, lanes), then broadcast — register-resident VPU work
    # that replaces 8 precomputed HBM rows (and ~15 XLA passes) in prep
    def corners(v, m, n_valid):
        v0 = jnp.floor(v)
        f = v - v0
        valid0 = ((v0 >= 0.0) & (v0 < n_valid)).astype(jnp.float32)
        valid1 = ((v0 + 1.0 >= 0.0) & (v0 + 1.0 < n_valid)
                  ).astype(jnp.float32)
        c0 = jnp.clip(v0, 0.0, n_valid - 1.0)
        c1 = jnp.clip(v0 + 1.0, 0.0, n_valid - 1.0)
        w0 = (1.0 - f) * valid0 * m
        w1 = f * valid1 * m
        return c0, c1, w0, w1

    def bcast(a, rows_n):
        return jnp.broadcast_to(a, (rows_n, lanes))

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (w_pad, lanes),
                                      0).astype(jnp.float32)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (slab_h, lanes),
                                      0).astype(jnp.float32)
    y_rel = iota_y + y_lo.astype(jnp.float32)

    for g in range(group):
        sl = img_ref[0, g, pl.ds(y_lo * gc, rows), :].astype(cdt)

        iy_l = aux_ref[0, g, 0, 0:1, :]
        ix_l = aux_ref[0, g, 0, 1:2, :]
        m_l = aux_ref[0, g, 0, 2:3, :]

        # stage A: 2-hot x-weights (mask folded) -> one matmul over W_pad
        x0a_l, x0b_l, wx0_l, wx1_l = corners(ix_l, m_l,
                                             float(dims["w_in"]))
        x0a = bcast(x0a_l, w_pad)
        x0b = bcast(x0b_l, w_pad)
        wx0 = bcast(wx0_l, w_pad)
        wx1 = bcast(wx1_l, w_pad)
        ext = (jnp.where(iota_x == x0a, wx0, 0.0)
               + jnp.where(iota_x == x0b, wx1, 0.0)).astype(cdt)
        rmix_ref[...] = jax.lax.dot_general(
            sl, ext, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)

        # stage B: y-weights built small (slab_h, lanes); each slab y-row
        # contributes rmix[y*gc:(y+1)*gc, :] * ey[y, :] — a static
        # contiguous sublane slice times a one-row sublane broadcast,
        # accumulated over the slab_h rows.  This replaces the earlier
        # two 0/1-structured matmuls (a (rows, slab_h) np.repeat
        # expansion and a (gc, rows) segment reduce) whose MXU cost
        # dominated the kernel ((slab_h + gc) * rows MACs per lane vs
        # slab_h FMAs per element here); unlike the culled norm kernels
        # this is NOT a cross-sublane VPU reduction — every add is
        # elementwise over (gc, lanes).
        y0a_l, y0b_l, wy0_l, wy1_l = corners(iy_l, 1.0,
                                             float(dims["h_in"]))
        y0a = bcast(y0a_l, slab_h)
        y0b = bcast(y0b_l, slab_h)
        wy0 = bcast(wy0_l, slab_h)
        wy1 = bcast(wy1_l, slab_h)
        ey = (jnp.where(y_rel == y0a, wy0, 0.0)
              + jnp.where(y_rel == y0b, wy1, 0.0)).astype(cdt)

        red = jnp.zeros((gc, lanes), jnp.float32)
        for y in range(slab_h):
            red = red + (rmix_ref[pl.ds(y * gc, gc), :]
                         * ey[y:y + 1, :]).astype(jnp.float32)

        acc = jnp.zeros((gc, t), jnp.float32)
        for i in range(p):
            acc = acc + red[:, i * t:(i + 1) * t]
        o_ref[0, g] = acc


def dcnv3_windowed_pallas(x, offset, mask, kernel=3, stride=1, pad=1,
                          dilation=1, group=4, offset_scale=1.0,
                          window=3, interpret=False,
                          compute_dtype=jnp.bfloat16,
                          vmem_limit_bytes=100 * 1024 * 1024):
    """Windowed DCNv3 forward.  Contract of ``dcnv3_core(..., window=w)``:
    x (N,H,W,G*C), offset (N,Ho,Wo,G*P*2), mask (N,Ho,Wo,G*P)
    -> (N,Ho,Wo,G*C) f32, with sampling clamped to +-window per query."""
    assert window > 0, "use dcnv3_pallas for the unwindowed form"
    n = x.shape[0]
    # x is NOT up-cast to f32: _prepare pads in the incoming dtype and
    # casts straight to compute_dtype.  When x arrives bf16 (the module's
    # compute dtype) this is bit-identical to the old f32 round trip
    # (f32(bf16) -> bf16 is the identity) minus ~0.5 GB of HBM traffic
    # at the MAPEncoder L0 shape.  Offsets/mask stay f32: fractional
    # sampling positions need the mantissa.
    img, aux, d = _prepare(x,
                           offset.astype(jnp.float32),
                           mask.astype(jnp.float32), kernel, stride, pad,
                           dilation, group, offset_scale, window,
                           img_dtype=compute_dtype, interpret=interpret)
    gc, p, t = d["gc"], d["p"], d["t"]
    n_tiles = d["n_tiles"]
    rows = d["slab_h"] * gc

    out = pl.pallas_call(
        functools.partial(_win_kernel, dims=d, compute_dtype=compute_dtype),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, group, d["h_eff"] * gc, d["w_pad"]),
                         lambda i, q: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, 1, 3, p * t),
                         lambda i, q: (i, 0, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, gc, t),
                               lambda i, q: (i, 0, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, group, gc, n_tiles * t),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, p * t), compute_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(img, aux)

    out = out[..., :d["q_pix"]]
    out = out.transpose(0, 3, 1, 2).reshape(n, d["h_out"], d["w_out"],
                                            group * gc)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def dcnv3_windowed(x, offset, mask, kernel=3, stride=1, pad=1, dilation=1,
                   group=4, offset_scale=1.0, window=3):
    """Windowed DCNv3 with Pallas forward and XLA-autodiff backward (via
    the unwindowed bwd kernel on window-clamped locations)."""
    return dcnv3_windowed_pallas(x, offset, mask, kernel, stride, pad,
                                 dilation, group, offset_scale, window)


def _fwd(x, offset, mask, kernel, stride, pad, dilation, group,
         offset_scale, window):
    out = dcnv3_windowed_pallas(x, offset, mask, kernel, stride, pad,
                                dilation, group, offset_scale, window)
    return out, (x, offset, mask)


def _bwd(kernel, stride, pad, dilation, group, offset_scale, window,
         residuals, g):
    # Reuse the unwindowed Pallas backward on window-clamped locations:
    # the clamp happens inside _prepare_inputs (window=...), and jax.vjp
    # through that prep carries the clip's zero-gradient-at-the-bound
    # semantics into d_offset.
    from givepose_tpu.ops.dcnv3_pallas import (
        _prepare_inputs,
        _static_dims,
        auto_tiles,
    )
    from givepose_tpu.ops.dcnv3_pallas_bwd import dcnv3_pallas_bwd

    x, offset, mask = residuals
    n = x.shape[0]
    tap_chunk, pix_tile_max = auto_tiles(
        x.shape, offset.shape, kernel, pad, group, jnp.float32,
        6 * 1024 * 1024)

    def prep(a, b, c):
        img_t, aux, _ = _prepare_inputs(
            a.astype(jnp.float32), b.astype(jnp.float32),
            c.astype(jnp.float32), kernel, stride, pad, dilation, group,
            offset_scale, pix_tile_max=pix_tile_max, k_major=False,
            k_align=128, window=window)
        return img_t, aux

    (img_t, aux), vjp_prep = jax.vjp(prep, x, offset, mask)
    dims = _static_dims(x.shape, offset.shape, kernel, pad, group,
                        pix_tile_max=pix_tile_max, k_align=128)

    gc = dims["gc"]
    q_pix = dims["q_pix"]
    q_pad = dims["n_tiles"] * dims["pix_tile"]
    gk = (g.astype(jnp.float32)
          .reshape(n, q_pix, group, gc).transpose(0, 2, 3, 1))
    gk = jnp.pad(gk, ((0, 0), (0, 0), (0, 0), (0, q_pad - q_pix)))

    d_img_t, d_aux = dcnv3_pallas_bwd(img_t, aux, gk, dims,
                                      tap_chunk=tap_chunk)
    return vjp_prep((d_img_t, d_aux))


dcnv3_windowed.defvjp(_fwd, _bwd)
