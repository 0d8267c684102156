"""Centroid + z -> full SE(3) pose assembly.

Replaces ``network/pose_utils/pose_from_pred_centroid_z.py``.  The reference
has two paths: a differentiable torch path for training (:160-249) and a
per-instance numpy loop at test time (:59-157).  Both reduce to the same
math; here there is a single batched, differentiable jnp implementation used
for train AND eval (the eval path simply runs it under jit without
gradients, eliminating the reference's GPU->CPU sync per instance).
"""

from __future__ import annotations

import jax.numpy as jnp

from givepose_tpu.geometry.allo_ego import allo_to_ego_mat, allo_to_ego_quat
from givepose_tpu.geometry.rotations import quat_to_mat

# Wild6D z recalibration constant (reference pose_from_pred_centroid_z.py:110-111)
WILD6D_FOCAL_REF = 590.0


def pose_from_pred_centroid_z(
    pred_rots: jnp.ndarray,
    pred_centroids: jnp.ndarray,
    pred_z_vals: jnp.ndarray,
    roi_cams: jnp.ndarray,
    roi_centers: jnp.ndarray,
    resize_ratios: jnp.ndarray,
    roi_whs: jnp.ndarray,
    eps: float = 1e-4,
    is_allo: bool = True,
    z_type: str = "REL",
    is_wild6d: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble egocentric (R, t) from network outputs.

    Args:
      pred_rots: (B,3,3) rotation matrices or (B,4) quaternions (allocentric
        when ``is_allo``).
      pred_centroids: (B,2) predicted 2D centroid offset, normalized by the
        roi width/height.
      pred_z_vals: (B,1) regressed depth (relative when z_type == 'REL').
      roi_cams: (B,3,3) camera intrinsics.
      roi_centers: (B,2) crop centers in source-image pixels.
      resize_ratios: (B,) out_res / crop_scale.
      roi_whs: (B,2) original bbox (w,h) in pixels.
      is_wild6d: apply the focal-length recalibration z *= fx/590 used for
        the Wild6D dataset (reference :110-111).

    Returns:
      (rot_ego (B,3,3), translation (B,3))
    """
    # absolute 2D centroid (reference :193-199)
    cx = pred_centroids[:, 0:1] * roi_whs[:, 0:1] + roi_centers[:, 0:1]
    cy = pred_centroids[:, 1:2] * roi_whs[:, 1:2] + roi_centers[:, 1:2]

    # unnormalize regressed z (reference :204-211)
    if "ABS" in z_type:
        z = pred_z_vals
    elif "REL" in z_type:
        z = pred_z_vals * resize_ratios.reshape(-1, 1)
    else:
        raise ValueError(f"Unknown z_type: {z_type}")
    if is_wild6d:
        z = z * roi_cams[:, 0:1, 0] / WILD6D_FOCAL_REF

    # backproject centroid through K (reference :226-233):
    #   tx = (cx - px) * tz / fx ; ty = (cy - py) * tz / fy ; tz = z
    fx = roi_cams[:, 0:1, 0]
    fy = roi_cams[:, 1:2, 1]
    px = roi_cams[:, 0:1, 2]
    py = roi_cams[:, 1:2, 2]
    translation = jnp.concatenate(
        [z * (cx - px) / fx, z * (cy - py) / fy, z], axis=1)

    if pred_rots.ndim == 2 and pred_rots.shape[-1] == 4:
        quat_allo = pred_rots / (
            jnp.linalg.norm(pred_rots, axis=1, keepdims=True) + eps)
        if is_allo:
            quat_ego = allo_to_ego_quat(translation, quat_allo, eps=eps)
        else:
            quat_ego = quat_allo
        rot_ego = quat_to_mat(quat_ego)
    elif pred_rots.ndim == 3 and pred_rots.shape[-1] == 3:
        if is_allo:
            rot_ego = allo_to_ego_mat(translation, pred_rots, eps=eps)
        else:
            rot_ego = pred_rots
    else:
        raise ValueError(f"bad pred_rots shape: {pred_rots.shape}")
    return rot_ego, translation
