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

import numpy as np

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
    # precision="highest": TPU matmuls default to bf16, which would round
    # bilinear tap weights; crops must match the host mirror exactly.
    out = jnp.einsum("oh,hwc->owc", wy, img, precision="highest")
    out = jnp.einsum("pw,owc->opc", wx, out, precision="highest")
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
    out = jnp.einsum("boh,bhwc->bowc", wy, imgs, precision="highest")
    return jnp.einsum("bpw,bowc->bopc", wx, out, precision="highest")


def _resample_axis_np(data: np.ndarray, src: np.ndarray, size: int,
                      axis: int, method: str) -> np.ndarray:
    """Gather-with-interpolation along one axis, mirroring resize_matrix.

    ``src`` holds f32 sample positions for each output index.  Nearest is
    an exact gather (identical to the one-hot matmul); bilinear combines
    the two taps in the same order the separable matmul reduces them, so
    host and device agree to f32 rounding.
    """
    if method == "nearest":
        idx = np.floor(src + np.float32(0.5))
        ok = (idx >= 0) & (idx <= size - 1)
        take = np.take(data, np.clip(idx, 0, size - 1).astype(np.int64),
                       axis=axis)
        shape = [1] * data.ndim
        shape[axis] = -1
        return take * ok.astype(np.float32).reshape(shape)
    if method == "bilinear":
        x0 = np.floor(src)
        frac = src - x0
        i0 = x0.astype(np.int64)
        i1 = i0 + 1
        ok0 = ((i0 >= 0) & (i0 < size)).astype(np.float32)
        ok1 = ((i1 >= 0) & (i1 < size)).astype(np.float32)
        t0 = np.take(data, np.clip(i0, 0, size - 1), axis=axis)
        t1 = np.take(data, np.clip(i1, 0, size - 1), axis=axis)
        shape = [1] * data.ndim
        shape[axis] = -1
        w0 = ((np.float32(1) - frac) * ok0).reshape(shape)
        w1 = (frac * ok1).reshape(shape)
        return t0 * w0 + t1 * w1
    raise ValueError(f"unknown method: {method}")


def crop_resize_affine_np(arr: np.ndarray, center, scale, out_size: int,
                          method: str = "nearest") -> np.ndarray:
    """Host-side mirror of crop_resize_affine (same f32 arithmetic).

    The eval loader serves crops through this function so the network
    sees the SAME resampling at train (device matmul) and eval (host
    numpy) — the reference uses one crop_resize_by_warp_affine both
    sides (tools/dataset_utils.py:101-114).  cv2.warpAffine is NOT
    equivalent: its fixed-point coordinate math rounds sample positions
    to 1/32 px, which flips nearest-neighbor picks by +-1 px and was
    measured to cost double-digit-degree eval rotation error on
    memorized scenes.
    """
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[..., None]
    arr = np.ascontiguousarray(arr, np.float32)
    h, w = arr.shape[:2]
    a = np.float32(scale) / np.float32(out_size)
    bx = np.float32(center[0]) - np.float32(0.5) * np.float32(out_size) * a
    by = np.float32(center[1]) - np.float32(0.5) * np.float32(out_size) * a
    dst = np.arange(out_size, dtype=np.float32)
    out = _resample_axis_np(arr, a * dst + by, h, 0, method)
    out = _resample_axis_np(out, a * dst + bx, w, 1, method)
    if squeeze:
        out = out[..., 0]
    return out


def resize_image_np(arr: np.ndarray, out_size: int) -> np.ndarray:
    """Host-side mirror of preprocess_batch's full-image bilinear resize
    (cv2.resize pixel-center mapping src = (dst+0.5)*a - 0.5, computed
    with the same f32 coefficients as the device matmul form)."""
    arr = np.ascontiguousarray(arr, np.float32)
    h, w = arr.shape[:2]
    dst = np.arange(out_size, dtype=np.float32)
    ay = np.float32(h / out_size)
    ax = np.float32(w / out_size)
    by = np.float32(0.5 * h / out_size - 0.5)
    bx = np.float32(0.5 * w / out_size - 0.5)
    out = _resample_axis_np(arr, ay * dst + by, h, 0, "bilinear")
    return _resample_axis_np(out, ax * dst + bx, w, 1, "bilinear")


def crop_coord_2d_np(center, scale, out_res: int, im_w: int,
                     im_h: int) -> np.ndarray:
    """Host-side mirror of data.preprocess.crop_coord_2d (closed-form
    nearest crop of the normalized pixel grid); returns (out,out,2),
    x in channel 0."""
    a = np.float32(scale) / np.float32(out_res)
    bx = np.float32(center[0]) - np.float32(0.5) * np.float32(out_res) * a
    by = np.float32(center[1]) - np.float32(0.5) * np.float32(out_res) * a
    j = np.arange(out_res, dtype=np.float32)
    sx = np.floor(a * j + bx + np.float32(0.5))
    sy = np.floor(a * j + by + np.float32(0.5))
    nx = (sx - (im_w - 1) / 2) / ((im_w - 1) / 2)
    ny = (sy - (im_h - 1) / 2) / ((im_h - 1) / 2)
    xx = np.broadcast_to(nx[None, :], (out_res, out_res))
    yy = np.broadcast_to(ny[:, None], (out_res, out_res))
    # cv2.warpAffine zero border (reference :285-287): an output cell
    # whose NEAREST source pixel falls outside the image gets (0,0),
    # not the extrapolated grid value — boundary crops (pad 1.5x) hit
    # this on most border objects
    valid = ((sx >= 0) & (sx <= im_w - 1))[None, :] \
        & ((sy >= 0) & (sy <= im_h - 1))[:, None]
    out = np.stack([xx, yy], axis=-1).astype(np.float32)
    return out * valid[:, :, None].astype(np.float32)


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
