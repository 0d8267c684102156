"""On-device crop/zoom resampling as MXU matmuls.

The reference's host hot loop warps every sample seven times with
cv2.warpAffine (datasets/load_data_nocs.py:277-331 via
tools/dataset_utils.py:101-114 crop_resize_by_warp_affine).  The affine it
uses (get_affine_transform, dataset_utils.py:116-157) never rotates
(rot=0 everywhere on the train/eval paths), so the warp is an axis-aligned
uniform scale + translation.  Such a warp is *separable*:

    out = W_y @ img @ W_x^T        (per channel)

where W_y (out, in_h) and W_x (out, in_w) are sparse interpolation
matrices.  Dense-matmul form runs on the MXU and lets the whole DZI crop
pipeline live on device inside the jitted train step instead of in host
worker processes.
"""

from __future__ import annotations

import jax.numpy as jnp


def affine_crop_params(center, scale, out_size: int):
    """Inverse-map line coefficients: src = a * dst + b (per axis).

    Derived from get_affine_transform with rot=0 (dataset_utils.py:116-157):
    dst = (src - center) * out/scale + out/2  =>  src = (dst - out/2) *
    scale/out + center.  ``scale`` is the square crop side; cv2 convention
    puts pixel centers at integer coordinates.
    """
    a = scale / out_size
    bx = center[..., 0] - 0.5 * out_size * a
    by = center[..., 1] - 0.5 * out_size * a
    return a, bx, by


def resize_matrix(src_size: int, out_size: int, a, b,
                  method: str = "bilinear",
                  dtype=jnp.float32) -> jnp.ndarray:
    """Build an (out_size, src_size) interpolation matrix for src = a*dst+b.

    a, b may be scalars or batched (leading dims broadcast); the result has
    shape (..., out_size, src_size).  Out-of-range samples get zero rows
    (cv2 BORDER_CONSTANT 0 semantics).
    """
    dst = jnp.arange(out_size, dtype=dtype)
    a = jnp.asarray(a, dtype)[..., None]
    b = jnp.asarray(b, dtype)[..., None]
    src = a * dst + b                                  # (..., out)
    grid = jnp.arange(src_size, dtype=dtype)           # (src,)

    if method == "nearest":
        # cv2 INTER_NEAREST rounds the mapped coordinate
        idx = jnp.floor(src + 0.5)
        w = (grid == idx[..., None]).astype(dtype)
        inb = ((idx >= 0) & (idx <= src_size - 1)).astype(dtype)
        return w * inb[..., None]

    if method == "bilinear":
        x0 = jnp.floor(src)
        frac = src - x0
        w0 = (grid == x0[..., None]).astype(dtype) * (1 - frac)[..., None]
        w1 = (grid == (x0 + 1)[..., None]).astype(dtype) * frac[..., None]
        # zero-border: weights for out-of-range corners vanish because the
        # one-hot match fails; additionally kill rows fully outside
        return w0 + w1

    raise ValueError(f"unknown method: {method}")


def crop_resize_affine(img: jnp.ndarray, center, scale, out_size: int,
                       method: str = "bilinear") -> jnp.ndarray:
    """Crop-and-resize one image, matching crop_resize_by_warp_affine.

    Args:
      img: (H, W, C) or (H, W).
      center: (2,) crop center (x, y) in source pixels.
      scale: scalar square crop side in source pixels.
    Returns:
      (out_size, out_size, C) (or (out,out)).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w = img.shape[:2]
    a, bx, by = affine_crop_params(jnp.asarray(center), jnp.asarray(scale),
                                   out_size)
    wy = resize_matrix(h, out_size, a, by, method, img.dtype)
    wx = resize_matrix(w, out_size, a, bx, method, img.dtype)
    out = jnp.einsum("oh,hwc->owc", wy, img)
    out = jnp.einsum("pw,owc->opc", wx, out)
    if squeeze:
        out = out[..., 0]
    return out


def batched_crop_resize(imgs: jnp.ndarray, centers, scales, out_size: int,
                        method: str = "bilinear") -> jnp.ndarray:
    """(B,H,W,C) + per-sample center/scale -> (B,out,out,C) on the MXU."""
    h, w = imgs.shape[1:3]
    a, bx, by = affine_crop_params(jnp.asarray(centers),
                                   jnp.asarray(scales), out_size)
    wy = resize_matrix(h, out_size, a, by, method, imgs.dtype)   # (B,o,H)
    wx = resize_matrix(w, out_size, a, bx, method, imgs.dtype)   # (B,o,W)
    out = jnp.einsum("boh,bhwc->bowc", wy, imgs)
    return jnp.einsum("bpw,bowc->bopc", wx, out)


def get_2d_coord_grid(width: int, height: int, norm: bool = True,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Normalized pixel grid, layout (2, H, W) with x first.

    Reference tools/dataset_utils.py:8-30 (get_2d_coord_np): values in
    [-1, 1] via (v - (n-1)/2) / ((n-1)/2).
    """
    x = jnp.arange(width, dtype=dtype)
    y = jnp.arange(height, dtype=dtype)
    if norm:
        x = (x - (width - 1) / 2) / ((width - 1) / 2)
        y = (y - (height - 1) / 2) / ((height - 1) / 2)
    xx = jnp.broadcast_to(x[None, :], (height, width))
    yy = jnp.broadcast_to(y[:, None], (height, width))
    return jnp.stack([xx, yy], axis=0)
