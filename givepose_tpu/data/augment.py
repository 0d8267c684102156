"""On-device data augmentation.

Color jitter reproduces the reference's default 'new' imgaug pipeline
(datasets/load_data_nocs.py:559-574): a random-order composition of
PIL-style enhancement ops, each applied with its own probability:

    Sometimes(0.3, EnhanceSharpness(factor 0..2))
    Sometimes(0.5, EnhanceContrast(factor 0.5..1.5))
    Sometimes(0.5, EnhanceBrightness(factor 0.5..1.5))
    Sometimes(0.3, EnhanceColor(factor 0..3))

PIL semantics (matching Pillow's ImageEnhance):
  sharpness:  blend with a 3x3 smooth kernel ([1,1,1;1,5,1;1,1,1]/13)
  contrast:   blend with the mean of the grayscale image
  brightness: blend with black
  color:      blend with the grayscale image
  blend(a, b, f) = b + f * (a - b);  grayscale = ITU-R 601-2 luma.

The random ORDER of the four ops is drawn PER SAMPLE (matching the
reference's per-image imgaug random_order=True) via per-row argsort of
uniform ranks; factor distributions are identical.  Mask deformation
matches defor_2D (datasets/data_augmentation.py:11-33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _blend(a, b, factor):
    return b + factor * (a - b)


def _sharpness(img, factor):
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]],
                       jnp.float32) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        img.transpose(0, 3, 1, 2).reshape(-1, 1, *img.shape[1:3]),
        kernel[None, None], (1, 1), "SAME")
    smoothed = smoothed.reshape(img.shape[0], img.shape[3],
                                *img.shape[1:3]).transpose(0, 2, 3, 1)
    # PIL keeps the border pixels unchanged
    out = _blend(img, smoothed, factor[:, None, None, None])
    out = out.at[:, 0, :, :].set(img[:, 0, :, :])
    out = out.at[:, -1, :, :].set(img[:, -1, :, :])
    out = out.at[:, :, 0, :].set(img[:, :, 0, :])
    out = out.at[:, :, -1, :].set(img[:, :, -1, :])
    return out


def _contrast(img, factor):
    gray = jnp.einsum("bhwc,c->bhw", img, _LUMA)
    mean = jnp.mean(gray, axis=(1, 2), keepdims=True)[..., None]
    return _blend(img, mean, factor[:, None, None, None])


def _brightness(img, factor):
    return img * factor[:, None, None, None]


def _color(img, factor):
    gray = jnp.einsum("bhwc,c->bhw", img, _LUMA)[..., None]
    return _blend(img, gray, factor[:, None, None, None])


def color_augment(key, img, prob: float = 0.8):
    """Apply the 'new' color pipeline to a (B,H,W,3) [0,255] batch."""
    b = img.shape[0]
    keys = jax.random.split(key, 10)
    apply_any = jax.random.uniform(keys[0], (b,)) < prob

    ops = [
        (_sharpness, 0.3, (0.0, 2.0), keys[1], keys[2]),
        (_contrast, 0.5, (0.5, 1.5), keys[3], keys[4]),
        (_brightness, 0.5, (0.5, 1.5), keys[5], keys[6]),
        (_color, 0.3, (0.0, 3.0), keys[7], keys[8]),
    ]
    # per-sample random order: argsort of uniform ranks gives an
    # independent uniform permutation per row
    order = jnp.argsort(jax.random.uniform(keys[9], (b, 4)), axis=1)

    out = img
    for slot in range(4):
        for op_idx, (fn, p, (lo, hi), kp, kf) in enumerate(ops):
            factor = jax.random.uniform(kf, (b,), minval=lo, maxval=hi)
            active = ((jax.random.uniform(kp, (b,)) < p)
                      & apply_any
                      & (order[:, slot] == op_idx))
            cand = fn(out, factor)
            out = jnp.where(active[:, None, None, None], cand, out)
    return jnp.clip(out, 0.0, 255.0)


def defor_2d_mask(key, mask, prob: float = 0.5):
    """Mask boundary noise (reference defor_2D, data_augmentation.py:11-33).

    Erode/dilate with a 2x2 kernel (the reference's iterations arg lands in
    cv2's dst slot, so it is always one iteration); in the band where they
    differ, pixels flip to 0/1 with probability 1/2 (the reference samples
    an exact half without replacement; Bernoulli(1/2) matches in
    distribution per pixel).

    mask: (B, H, W) in {0, 1}.
    """
    b = mask.shape[0]
    k_apply, k_fill = jax.random.split(key)
    m4 = mask[..., None]
    # cv2's even-kernel anchor reads the window (y-1..y, x-1..x):
    # pad one row/col BEFORE so the window looks backward like cv2
    dilate = jax.lax.reduce_window(
        m4, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1),
        [(0, 0), (1, 0), (1, 0), (0, 0)])
    erode = -jax.lax.reduce_window(
        -m4, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1),
        [(0, 0), (1, 0), (1, 0), (0, 0)])
    band = (dilate != erode)[..., 0]
    fill = jax.random.bernoulli(k_fill, 0.5, mask.shape).astype(mask.dtype)
    deformed = jnp.where(band, fill, mask)
    deformed = (deformed > 0).astype(mask.dtype)
    active = jax.random.uniform(k_apply, (b,)) < prob
    return jnp.where(active[:, None, None], deformed, mask)
