"""BOP-style pose errors: MSSD, MSPD, VSD.

Reference network/pose_utils/pose_error.py:19-220 carries the BOP metric
suite (vsd/mssd/mspd plus re/te).  Implemented here with batched jnp math
and, for VSD, the framework's own z-buffer point renderer
(givepose_tpu.prep.renderer) instead of an OpenGL context.

Symmetry transforms follow the BOP convention (pose_error.py:143-151):
each is a rotation S with an optional translation t_s, applied as
R_gt_sym = R_gt @ S and t_gt_sym = R_gt @ t_s + t_gt.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from givepose_tpu.prep.renderer import render_points


def _sym_list(syms, sym_ts):
    rs = np.asarray(syms).reshape(-1, 3, 3)
    if sym_ts is None:
        ts = np.zeros((len(rs), 3), np.float64)
    else:
        ts = np.asarray(sym_ts).reshape(-1, 3)
        assert len(ts) == len(rs), (len(ts), len(rs))
    return rs, ts


def mssd(r_est, t_est, r_gt, t_gt, pts, syms, sym_ts=None) -> float:
    """Maximum Symmetry-aware Surface Distance (pose_error.py:128-150).

    min over symmetry transforms (S, t_s) of
    max_x ||(R̂x+t̂) - (R̄Sx + R̄t_s + t̄)||.

    Args:
      r_est/r_gt: (3,3); t_est/t_gt: (3,); pts: (N,3) model points;
      syms: (K,3,3) symmetry rotations (include identity);
      sym_ts: optional (K,3) symmetry translations (BOP models_info).
    """
    r_gt = np.asarray(r_gt)
    t_gt = np.asarray(t_gt)
    est = pts @ np.asarray(r_est).T + np.asarray(t_est)
    dists = []
    for s, ts in zip(*_sym_list(syms, sym_ts)):
        gt = (pts @ s.T) @ r_gt.T + (r_gt @ ts + t_gt)
        dists.append(np.linalg.norm(est - gt, axis=1).max())
    return float(min(dists))


def mspd(r_est, t_est, r_gt, t_gt, k, pts, syms, sym_ts=None) -> float:
    """Maximum Symmetry-aware Projection Distance in pixels
    (pose_error.py:153-177)."""
    k = np.asarray(k)
    r_gt = np.asarray(r_gt)
    t_gt = np.asarray(t_gt)

    def proj(cam):
        uv = cam @ k.T
        return uv[:, :2] / uv[:, 2:3]

    est = proj(pts @ np.asarray(r_est).T + np.asarray(t_est))
    dists = []
    for s, ts in zip(*_sym_list(syms, sym_ts)):
        gt = proj((pts @ s.T) @ r_gt.T + (r_gt @ ts + t_gt))
        dists.append(np.linalg.norm(est - gt, axis=1).max())
    return float(min(dists))


def _depth_to_dist(depth, k):
    """Depth (z) image -> ray-distance image (BOP
    misc.depth_im_to_dist_im_fast): dist = z * ||[(x-cx)/fx, (y-cy)/fy,
    1]||; zero where depth is zero."""
    h, w = depth.shape
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    xs = (np.arange(w, dtype=np.float64) - cx) / fx
    ys = (np.arange(h, dtype=np.float64) - cy) / fy
    factor = np.sqrt(xs[None, :] ** 2 + ys[:, None] ** 2 + 1.0)
    return depth.astype(np.float64) * factor


def vsd(r_est, t_est, r_gt, t_gt, k, pts, depth_test,
        delta: float = 15.0, taus=(20.0,), im_h: int = 480,
        im_w: int = 640, normalized_by_diameter: bool = False,
        diameter: float = 1.0, cost_type: str = "step") -> list[float]:
    """Visible Surface Discrepancy (pose_error.py:19-126, BOP19).

    Renders the model under both poses with the z-buffer splat renderer,
    converts all depth images to ray-distance images
    (misc.depth_im_to_dist_im_fast), estimates bop19 visibility masks
    (test-depth holes count as visible; the estimate's mask is unioned
    with visib_gt & d_est>0 per visibility.estimate_visib_mask_est), and
    scores (cost over the intersection + |union \\ intersection|) /
    |union|.

    Returns one error per tau.
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
    k = np.asarray(k, np.float64)
    dist_est = _depth_to_dist(np.asarray(d_est), k)
    dist_gt = _depth_to_dist(np.asarray(d_gt), k)
    dist_test = _depth_to_dist(np.asarray(depth_test), k)

    # bop19 visibility (visibility.py): visible where the model surface
    # exists and is not occluded by more than delta; test-depth holes
    # (dist_test == 0) count as visible
    def visib(dist_model):
        return (dist_model > 0) & ((dist_test == 0)
                                   | (dist_model - dist_test <= delta))

    visib_gt = visib(dist_gt)
    # estimate_visib_mask_est: union with gt-visible pixels the estimate
    # also renders — the estimate cannot be "occluded" where the ground
    # truth object itself is the occluder
    visib_est = visib(dist_est) | (visib_gt & (dist_est > 0))

    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    n_union = union.sum()
    n_comp = n_union - inter.sum()
    dists = np.abs(dist_gt[inter] - dist_est[inter])
    if normalized_by_diameter:
        dists = dists / diameter
    out = []
    for tau in taus:
        if n_union == 0:
            out.append(1.0)
            continue
        if cost_type == "step":
            costs = float((dists >= tau).sum())
        elif cost_type == "tlinear":
            costs = float(np.minimum(dists / tau, 1.0).sum())
        else:
            raise ValueError(cost_type)
        out.append(float((costs + n_comp) / n_union))
    return out
