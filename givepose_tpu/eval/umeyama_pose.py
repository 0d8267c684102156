"""Depth-assisted Umeyama pose recovery (alternative eval path).

Reference tools/umeyama.py:17-60 (pose_from_umeyama): back-project the roi
depth crop through K at the predicted NOCS pixels and fit a similarity
transform NOCS->camera with RANSAC — a per-instance numpy loop there.
Here the whole instance batch runs as one vmapped jitted call with static
shapes (pad + mask); RANSAC is the 128-hypothesis parallel fit from
givepose_tpu.geometry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from givepose_tpu.geometry import ransac_umeyama


@functools.partial(jax.jit, static_argnames=())
def umeyama_pose_from_maps(nocs_coor, pixel_x, pixel_y, depth, mask,
                           cam_k, key):
    """Batched NOCS->depth similarity fit.

    Args:
      nocs_coor: (B, R, R, 3) predicted NOCS map.
      pixel_x/pixel_y: (B, R, R) ABSOLUTE source-image pixel coords of each
        output cell (the un-normalized roi_coord_2d).
      depth: (B, R, R) metric depth crop (0 = invalid).
      mask: (B, R, R) object mask.
      cam_k: (B, 3, 3).
      key: PRNG key.

    Returns dict(scale (B,), rotation (B,3,3), translation (B,3),
    inlier_ratio (B,)).
    """
    b, r = nocs_coor.shape[0], nocs_coor.shape[1]
    n = r * r
    fx = cam_k[:, 0, 0][:, None]
    fy = cam_k[:, 1, 1][:, None]
    ux = cam_k[:, 0, 2][:, None]
    uy = cam_k[:, 1, 2][:, None]
    d = depth.reshape(b, n)
    px = pixel_x.reshape(b, n)
    py = pixel_y.reshape(b, n)
    pc = jnp.stack([(px - ux) * d / fx, (py - uy) * d / fy, d], axis=-1)
    src = nocs_coor.reshape(b, n, 3)
    valid = ((mask.reshape(b, n) > 0) & (d > 0)).astype(jnp.float32)

    keys = jax.random.split(key, b)

    def one(s, t, v, k):
        return ransac_umeyama(s, t, valid=v, key=k)

    return jax.vmap(one)(src, pc, valid, keys)
