"""Allocentric <-> egocentric pose conversion, fully batched.

The reference has three versions: a per-sample numpy path used at test time
(``network/pose_utils/utils.py:29-84``), and differentiable torch paths used
at train time (``utils.py:156-229``).  All collapse to one batched jnp
implementation here: the camera-ray/object-ray rotation is built as a
quaternion directly (no acos branch on angle>0 — at angle==0 the axis is
degenerate but sin(angle/2)->0 makes the quaternion the identity, so one
branch-free formula covers both reference branches).
"""

from __future__ import annotations

import jax.numpy as jnp

from givepose_tpu.geometry.rotations import quat_to_mat


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (w,x,y,z) quaternions, broadcasting over batch.

    Reference utils.py:133-153 (quatmul_torch) without the corner dim.
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return jnp.stack([w, x, y, z], axis=-1)


def _allo_to_ego_correction_quat(translation: jnp.ndarray,
                                 eps: float = 1e-4) -> jnp.ndarray:
    """Quaternion rotating the optical-center ray (0,0,1) onto the object ray.

    Matches reference utils.py:198-226 (allo_to_ego_mat_torch): obj_ray is the
    normalized translation, angle = acos(obj_ray_z), axis = cam_ray x obj_ray
    normalized with +eps on the denominator.
    """
    obj_ray = translation / (jnp.linalg.norm(translation, axis=-1,
                                             keepdims=True) + eps)
    angle = jnp.arccos(jnp.clip(obj_ray[..., 2:3], -1.0, 1.0))
    # cam_ray = (0,0,1):  cam_ray x obj_ray = (-obj_y, obj_x, 0)
    axis = jnp.stack([-obj_ray[..., 1], obj_ray[..., 0],
                      jnp.zeros_like(obj_ray[..., 0])], axis=-1)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + eps)
    half = angle / 2.0
    s = jnp.sin(half)
    return jnp.concatenate([jnp.cos(half), axis * s], axis=-1)


def allo_to_ego_quat(translation: jnp.ndarray, q_allo: jnp.ndarray,
                     eps: float = 1e-4) -> jnp.ndarray:
    """Reference utils.py:156-195 (allocentric_to_egocentric_torch)."""
    q_corr = _allo_to_ego_correction_quat(translation, eps)
    return quat_mul(q_corr, q_allo)


def allo_to_ego_mat(translation: jnp.ndarray, rot_allo: jnp.ndarray,
                    eps: float = 1e-4) -> jnp.ndarray:
    """Reference utils.py:198-229 (allo_to_ego_mat_torch).

    translation (...,3), rot_allo (...,3,3) -> egocentric (...,3,3).
    """
    q_corr = _allo_to_ego_correction_quat(translation, eps)
    rot_corr = quat_to_mat(q_corr)
    # 3x3 matmuls are accuracy-critical and free; force f32 accumulation
    # so TPU bf16 default precision never degrades pose outputs.
    return jnp.matmul(rot_corr, rot_allo, precision="highest")


def ego_to_allo_mat(translation: jnp.ndarray, rot_ego: jnp.ndarray,
                    eps: float = 1e-4) -> jnp.ndarray:
    """Inverse correction (reference utils.py:87-130, batched)."""
    q_corr = _allo_to_ego_correction_quat(translation, eps)
    rot_corr = quat_to_mat(q_corr)
    return jnp.matmul(jnp.swapaxes(rot_corr, -1, -2), rot_ego,
                      precision="highest")
