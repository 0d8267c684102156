"""Depth -> point-cloud sampling (reference network/point_sample/
point_sample.py:9-129, Depth2PC).

The reference fuses mask*depth back-projection with random/partial point
sampling in torch (imported by the engine; dead on the RGB-only config).
Provided here batched and static-shaped for the depth-assisted training
configurations: every pixel is back-projected, a validity mask marks
usable points, and a fixed-size subset is drawn with mask-weighted
Gumbel-top-k (jit-safe replacement for masked random choice).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_to_points(depth, cam_k, mask=None):
    """(B,H,W) depth + (B,3,3) K -> ((B,H*W,3) points, (B,H*W) valid)."""
    b, h, w = depth.shape
    fx = cam_k[:, 0, 0][:, None, None]
    fy = cam_k[:, 1, 1][:, None, None]
    cx = cam_k[:, 0, 2][:, None, None]
    cy = cam_k[:, 1, 2][:, None, None]
    xs = jnp.arange(w, dtype=depth.dtype)[None, None, :]
    ys = jnp.arange(h, dtype=depth.dtype)[None, :, None]
    x = (xs - cx) * depth / fx
    y = (ys - cy) * depth / fy
    pts = jnp.stack([x, y, depth], axis=-1).reshape(b, h * w, 3)
    valid = depth > 0
    if mask is not None:
        valid = valid & (mask > 0)
    return pts, valid.reshape(b, h * w).astype(depth.dtype)


def sample_points(key, pts, valid, n_sample: int):
    """Draw ``n_sample`` valid points per batch element (static shape).

    Invalid points may appear when fewer than n_sample are valid; the
    returned mask marks genuinely valid draws.

    Returns (sampled (B, n, 3), sample_valid (B, n)).
    """
    b, m, _ = pts.shape
    logits = jnp.where(valid > 0, 0.0, -1e9)
    g = jax.random.gumbel(key, (b, m)) + logits
    _, idx = jax.lax.top_k(g, n_sample)                  # (B, n)
    sampled = jnp.take_along_axis(pts, idx[..., None], axis=1)
    sample_valid = jnp.take_along_axis(valid, idx, axis=1)
    return sampled, sample_valid


def depth_to_sampled_pc(key, depth, cam_k, mask, n_sample: int = 1024):
    """Fused Depth2PC: back-project + mask + sample (reference :9-129)."""
    pts, valid = depth_to_points(depth, cam_k, mask)
    return sample_points(key, pts, valid, n_sample)
