"""DCNv3 deformable convolution core for TPU.

The reference ships a CUDA extension (network/ops_dcnv3/src/cuda/
dcnv3_im2col_cuda.cuh:217 forward, :286-818 backward) whose numerical spec
is the pure-torch ``dcnv3_core_pytorch`` (functions/dcnv3_func.py:172-220):
per output pixel and group, sample K*K bilinear taps at
(reference grid + dilation grid + learned offsets) * offset_scale, weight
by a softmax mask, and accumulate.

This module is the TPU expression of that spec:

  * ``dcnv3_sampling_locations`` reproduces the reference's absolute-pixel
    sampling positions (including grid_sample align_corners=False
    half-pixel handling and zero padding-mode) in closed form.
  * ``dcnv3_core`` evaluates the bilinear gather + masked reduction as
    four XLA gathers + a weighted sum, batched over (N, G) — fully
    differentiable through input, offsets and mask, jit/vmap friendly.

A Pallas kernel backend (``givepose_tpu.ops.dcnv3_pallas``) accelerates the
same contract on TPU; this file is the always-available reference the
kernel is tested against (mirrors reference ops_dcnv3/test.py strategy).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def dcnv3_sampling_locations(
    offset: jnp.ndarray,
    h_in: int,
    w_in: int,
    kernel: int,
    stride: int,
    dilation: int,
    group: int,
    offset_scale: float,
) -> jnp.ndarray:
    """Absolute sampling coordinates in padded-input pixel space.

    Args:
      offset: (N, H_out, W_out, G*P*2) learned offsets, last dim ordered
        (g0p0x, g0p0y, g0p1x, ... ) matching the reference layout.
      h_in/w_in: padded input spatial dims.

    Returns:
      (N, H_out, W_out, G, P, 2) pixel-space (x, y) positions, where an
      integer coordinate addresses a texel center (grid_sample
      align_corners=False convention: px = loc_norm * size - 0.5).

    Derivation: the reference builds normalized locations
    ref + grid*offset_scale + offset*offset_scale/spatial_norm
    (dcnv3_func.py:189-200), doubles to [-1,1] and lets grid_sample map back
    to pixels; composing the two maps gives the closed form used here.
    """
    n, h_out, w_out, _ = offset.shape
    p = kernel * kernel
    half = (dilation * (kernel - 1)) // 2

    # reference points: center of each output pixel's receptive field
    # (dcnv3_func.py:109-137)
    ref_y = half + 0.5 + stride * np.arange(h_out, dtype=np.float32)
    ref_x = half + 0.5 + stride * np.arange(w_out, dtype=np.float32)

    # dilation grid (dcnv3_func.py:140-162): torch.meshgrid(x_lin, y_lin)
    # without indexing= uses 'ij', so the fast axis is y.
    lin = np.linspace(-half, -half + (kernel - 1) * dilation, kernel,
                      dtype=np.float32)
    gx = np.repeat(lin, kernel)          # x varies slowly
    gy = np.tile(lin, kernel)            # y varies fast
    grid = np.stack([gx, gy], axis=-1)   # (P, 2) in pixels

    base = np.zeros((h_out, w_out, p, 2), np.float32)
    base[..., 0] = ref_x[None, :, None] + grid[None, None, :, 0] * offset_scale
    base[..., 1] = ref_y[:, None, None] + grid[None, None, :, 1] * offset_scale
    base = base[None, :, :, None, :, :]  # (1, Ho, Wo, 1, P, 2)

    off = offset.reshape(n, h_out, w_out, group, p, 2)
    loc = base + off * offset_scale
    # grid_sample align_corners=False: px = loc_norm*size - 0.5, and the
    # reference normalized by (w_in, h_in); -0.5 centers on texels.
    return loc - 0.5


def clamp_to_window(loc: jnp.ndarray, h_out: int, w_out: int, kernel: int,
                    stride: int, dilation: int, window: int) -> jnp.ndarray:
    """Clamp sampling locations to a static window around each query.

    ``loc`` is the (N, Ho, Wo, G, P, 2) output of
    ``dcnv3_sampling_locations``.  Each query's samples are clamped to
    ``center +- window`` pixels per axis, where ``center`` is the query's
    receptive-field center (``half + stride*q`` in padded texel space).

    This is the TPU-first redesign of the reference's unbounded offsets
    (dcnv3_im2col_cuda.cuh:217 samples anywhere in the image): a static
    bound lets the Pallas kernel contract over a small slab instead of the
    full feature map.  With zero-initialised offset projections
    (modules/dcnv3.py:308-316) the initial field spans only the dilation
    grid (+-half), so any ``window >= half + 1`` starts loss-equivalent;
    training under the clamp keeps offsets inside it (gradients through
    ``clip`` vanish at the bound).
    """
    half = (dilation * (kernel - 1)) // 2
    cy = (half + stride * np.arange(h_out, dtype=np.float32))
    cx = (half + stride * np.arange(w_out, dtype=np.float32))
    lo_x = (cx - window)[None, None, :, None, None]
    hi_x = (cx + window)[None, None, :, None, None]
    lo_y = (cy - window)[None, :, None, None, None]
    hi_y = (cy + window)[None, :, None, None, None]
    return jnp.stack([jnp.clip(loc[..., 0], lo_x, hi_x),
                      jnp.clip(loc[..., 1], lo_y, hi_y)], axis=-1)


def _bilinear_gather(x_flat: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
                     h_in: int, w_in: int) -> jnp.ndarray:
    """Zero-padded bilinear sample.

    Args:
      x_flat: (N, G, H_in*W_in, C)
      ix, iy: (N, G, Q) float pixel coords.
    Returns:
      (N, G, Q, C)
    """
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = ix - x0
    wy1 = iy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(xc, yc, w):
        inb = ((xc >= 0) & (xc < w_in) & (yc >= 0) & (yc < h_in))
        xi = jnp.clip(xc, 0, w_in - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h_in - 1).astype(jnp.int32)
        idx = yi * w_in + xi                            # (N,G,Q)
        g = jnp.take_along_axis(x_flat, idx[..., None], axis=2)
        return g * (w * inb.astype(x_flat.dtype))[..., None]

    return (corner(x0, y0, wx0 * wy0)
            + corner(x0 + 1, y0, wx1 * wy0)
            + corner(x0, y0 + 1, wx0 * wy1)
            + corner(x0 + 1, y0 + 1, wx1 * wy1))


def dcnv3_core(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    kernel: int = 3,
    stride: int = 1,
    pad: int = 1,
    dilation: int = 1,
    group: int = 4,
    group_channels: int | None = None,
    offset_scale: float = 1.0,
    window: int = 0,
) -> jnp.ndarray:
    """DCNv3 forward (NHWC).  Differentiable; matches dcnv3_core_pytorch.

    Args:
      x: (N, H, W, G*C) input (pre-projection applied by the module).
      offset: (N, H_out, W_out, G*P*2).
      mask: (N, H_out, W_out, G*P), already softmaxed over P per group.
      window: if > 0, clamp sampling to ``center +- window`` per query
        (see ``clamp_to_window``); 0 keeps the reference's unbounded
        semantics.

    Returns:
      (N, H_out, W_out, G*C)
    """
    n, h, w, c_total = x.shape
    if group_channels is None:
        group_channels = c_total // group
    p = kernel * kernel
    _, h_out, w_out, _ = offset.shape

    x_pad = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h_in, w_in = h + 2 * pad, w + 2 * pad

    loc = dcnv3_sampling_locations(offset, h_in, w_in, kernel, stride,
                                   dilation, group, offset_scale)
    if window > 0:
        loc = clamp_to_window(loc, h_out, w_out, kernel, stride, dilation,
                              window)
    # (N, Ho, Wo, G, P, 2) -> (N, G, Q) with Q = Ho*Wo*P
    q = h_out * w_out * p
    ix = loc[..., 0].transpose(0, 3, 1, 2, 4).reshape(n, group, q)
    iy = loc[..., 1].transpose(0, 3, 1, 2, 4).reshape(n, group, q)

    # (N, G, S, C)
    x_flat = (x_pad.reshape(n, h_in * w_in, group, group_channels)
              .transpose(0, 2, 1, 3))

    sampled = _bilinear_gather(x_flat, ix, iy, h_in, w_in)
    sampled = sampled.reshape(n, group, h_out * w_out, p, group_channels)

    m = (mask.reshape(n, h_out * w_out, group, p)
         .transpose(0, 2, 1, 3))                        # (N,G,HW,P)
    out = jnp.einsum("ngqpc,ngqp->ngqc", sampled, m)
    out = (out.transpose(0, 2, 1, 3)
           .reshape(n, h_out, w_out, group * group_channels))
    return out
