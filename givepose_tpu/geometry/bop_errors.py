"""BOP-style pose errors: MSSD, MSPD, VSD.

Reference network/pose_utils/pose_error.py:19-220 carries the BOP metric
suite (vsd/mssd/mspd plus re/te).  Implemented here with batched jnp math
and, for VSD, the framework's own z-buffer point renderer
(givepose_tpu.prep.renderer) instead of an OpenGL context.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from givepose_tpu.prep.renderer import render_points


def mssd(r_est, t_est, r_gt, t_gt, pts, syms) -> float:
    """Maximum Symmetry-aware Surface Distance.

    min over symmetry transforms S of max_x ||(R̂x+t̂) - (R̄Sx+t̄)||.

    Args:
      r_est/r_gt: (3,3); t_est/t_gt: (3,); pts: (N,3) model points;
      syms: (K,3,3) symmetry rotations (include identity).
    """
    est = pts @ np.asarray(r_est).T + np.asarray(t_est)
    dists = []
    for s in np.asarray(syms).reshape(-1, 3, 3):
        gt = (pts @ s.T) @ np.asarray(r_gt).T + np.asarray(t_gt)
        dists.append(np.linalg.norm(est - gt, axis=1).max())
    return float(min(dists))


def mspd(r_est, t_est, r_gt, t_gt, k, pts, syms) -> float:
    """Maximum Symmetry-aware Projection Distance (pixels)."""
    k = np.asarray(k)

    def proj(r, t, p):
        cam = p @ np.asarray(r).T + np.asarray(t)
        uv = cam @ k.T
        return uv[:, :2] / uv[:, 2:3]

    est = proj(r_est, t_est, pts)
    dists = []
    for s in np.asarray(syms).reshape(-1, 3, 3):
        gt = proj(r_gt, t_gt, pts @ s.T)
        dists.append(np.linalg.norm(est - gt, axis=1).max())
    return float(min(dists))


def vsd(r_est, t_est, r_gt, t_gt, k, pts, depth_test,
        delta: float = 15.0, taus=(20.0,), im_h: int = 480,
        im_w: int = 640) -> list[float]:
    """Visible Surface Discrepancy.

    Renders the model under both poses with the z-buffer splat renderer,
    estimates visibility against the test depth image (tolerance delta, in
    the depth units), and scores the fraction of the visible union whose
    depth difference exceeds tau.

    Returns one error per tau (BOP averages over taus).
    """
    colors = jnp.ones((len(pts), 1), jnp.float32)
    _, d_est = render_points(jnp.asarray(pts, jnp.float32), colors,
                             jnp.asarray(r_est, jnp.float32),
                             jnp.asarray(t_est, jnp.float32),
                             jnp.asarray(k, jnp.float32), im_h, im_w)
    _, d_gt = render_points(jnp.asarray(pts, jnp.float32), colors,
                            jnp.asarray(r_gt, jnp.float32),
                            jnp.asarray(t_gt, jnp.float32),
                            jnp.asarray(k, jnp.float32), im_h, im_w)
    d_est = np.asarray(d_est)
    d_gt = np.asarray(d_gt)
    depth_test = np.asarray(depth_test)

    # visibility: rendered surface not occluded beyond delta by the scene
    vis_gt = (d_gt > 0) & ((depth_test <= 0)
                           | (d_gt <= depth_test + delta))
    vis_est = (d_est > 0) & ((depth_test <= 0)
                             | (d_est <= depth_test + delta))
    union = vis_gt | vis_est
    n_union = union.sum()
    out = []
    for tau in taus:
        if n_union == 0:
            out.append(1.0)
            continue
        inter = vis_gt & vis_est
        ok = inter & (np.abs(d_est - d_gt) < tau)
        out.append(float(1.0 - ok.sum() / n_union))
    return out
