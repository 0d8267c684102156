"""cv2 RANSAC-PnP alternative pose path (reference tools/utils/align.py:
31-52 ransac_pnp): solve rotation/translation from the dense NOCS map and
2D pixel grid with OpenCV's EPnP+RANSAC, per instance on host.

This is the depth-free classical baseline the reference keeps around; the
learned centroid-z head (geometry.pose_from_pred_centroid_z) is the
default path.
"""

from __future__ import annotations

import numpy as np


def ransac_pnp(nocs_coor: np.ndarray, pixel_x: np.ndarray,
               pixel_y: np.ndarray, mask: np.ndarray, cam_k: np.ndarray,
               nocs_scale: float = 1.0, min_points: int = 6):
    """One instance: (R, t) from NOCS<->pixel correspondences.

    Args:
      nocs_coor: (R, R, 3) predicted NOCS map.
      pixel_x/pixel_y: (R, R) absolute source-image pixel coords.
      mask: (R, R) foreground mask.
      cam_k: (3, 3).
      nocs_scale: metric scale multiplying the NOCS coords.

    Returns (R (3,3), t (3,)) or None on failure.
    """
    import cv2

    sel = mask > 0
    if sel.sum() < min_points:
        return None
    obj_pts = (nocs_coor[sel] * nocs_scale).astype(np.float64)
    img_pts = np.stack([pixel_x[sel], pixel_y[sel]],
                       axis=1).astype(np.float64)
    try:
        ok, rvec, tvec, _ = cv2.solvePnPRansac(
            obj_pts.reshape(-1, 1, 3), img_pts.reshape(-1, 1, 2),
            cam_k.astype(np.float64), None,
            reprojectionError=3.0, iterationsCount=100,
            flags=cv2.SOLVEPNP_EPNP)
    except cv2.error:
        return None
    if not ok:
        return None
    rot, _ = cv2.Rodrigues(rvec)
    return rot.astype(np.float32), tvec.reshape(3).astype(np.float32)


def ransac_pnp_batch(nocs_coor, pixel_x, pixel_y, mask, cam_k,
                     nocs_scales=None):
    """Per-instance loop over a batch; failures give identity poses
    (reference behavior on alignment failure)."""
    b = len(nocs_coor)
    rots = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    trans = np.zeros((b, 3), np.float32)
    ok = np.zeros((b,), bool)
    for i in range(b):
        s = 1.0 if nocs_scales is None else float(nocs_scales[i])
        fit = ransac_pnp(np.asarray(nocs_coor[i]), np.asarray(pixel_x[i]),
                         np.asarray(pixel_y[i]), np.asarray(mask[i]),
                         np.asarray(cam_k[i]), s)
        if fit is not None:
            rots[i], trans[i] = fit
            ok[i] = True
    return rots, trans, ok
