"""Software NOCS renderer (jnp point-splat z-buffer).

Replaces the reference's OpenGL renderer (prepare_data/renderer_py.py:
230-564, glumpy+GLSL phong) and the Blender NOCS-cube script
(render_nocs.py:1-41) with a dependency-free, jit-able point rasterizer:
project NOCS-colored surface points through K[R|t], z-buffer per pixel.
Sufficient for generating NOCS/IVFC-style maps and synthetic supervision;
it is the engine behind data.synthetic as well.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("im_h", "im_w"))
def render_points(points: jnp.ndarray, colors: jnp.ndarray,
                  rot: jnp.ndarray, trans: jnp.ndarray, k: jnp.ndarray,
                  im_h: int = 480, im_w: int = 640):
    """Z-buffered point splat.

    Args:
      points: (N, 3) object-space metric points.
      colors: (N, C) per-point values (e.g. NOCS coords).
      rot/trans: pose; k: (3,3) intrinsics.
    Returns:
      (image (H, W, C), depth (H, W) with 0 = empty).

    The z-buffer uses a segment-min over flattened pixel indices — a
    TPU/XLA-friendly scatter-min formulation instead of a rasterization
    loop.
    """
    cam = points @ rot.T + trans
    proj = cam @ k.T
    px = proj[:, 0] / proj[:, 2]
    py = proj[:, 1] / proj[:, 2]
    xi = jnp.round(px).astype(jnp.int32)
    yi = jnp.round(py).astype(jnp.int32)
    valid = ((xi >= 0) & (xi < im_w) & (yi >= 0) & (yi < im_h)
             & (cam[:, 2] > 1e-6))
    flat = jnp.where(valid, yi * im_w + xi, im_h * im_w)

    big = jnp.asarray(1e30, cam.dtype)
    z = jnp.where(valid, cam[:, 2], big)
    zbuf = jnp.full((im_h * im_w + 1,), big, cam.dtype)
    zbuf = zbuf.at[flat].min(z)
    # winner-take-all: a point owns its pixel iff it equals the min depth
    win = (z <= zbuf[flat]) & valid

    c = colors.shape[-1]
    # max-scatter needs a -inf identity: colors may be negative (NOCS)
    img = jnp.full((im_h * im_w + 1, c), -big, colors.dtype)
    img = img.at[flat].max(jnp.where(win[:, None], colors, -big))
    img = jnp.where(img <= -1e29, 0.0, img)
    depth = jnp.where(zbuf >= 1e29, 0.0, zbuf)
    return (img[:-1].reshape(im_h, im_w, c),
            depth[:-1].reshape(im_h, im_w))


def nocs_cube_points(n: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """Surface points + NOCS colors of the unit cube (the Blender
    render_nocs.py vertex-color cube)."""
    u = np.linspace(-0.5, 0.5, n)
    faces = []
    for axis in range(3):
        for sgn in (-0.5, 0.5):
            g1, g2 = np.meshgrid(u, u)
            pts = np.zeros((n * n, 3))
            others = [a for a in range(3) if a != axis]
            pts[:, others[0]] = g1.ravel()
            pts[:, others[1]] = g2.ravel()
            pts[:, axis] = sgn
            faces.append(pts)
    pts = np.concatenate(faces).astype(np.float32)
    return pts, (pts + 0.5).astype(np.float32)
