"""Batched rotation representations (pure jnp, jit/vmap/grad friendly).

Semantics match the reference torch implementations in
``network/pose_utils/rot_reps.py`` (rot6d: :34-91, via Zhou et al. CVPR'19)
and ``network/pose_utils/pose_utils.py:348`` (quat2mat), but all functions
here take arbitrary leading batch dims and compile to fused XLA — there are
no per-sample Python loops anywhere.
"""

from __future__ import annotations

import jax.numpy as jnp


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def rot6d_to_mat(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation -> (...,3,3) matrix.  Reference rot_reps.py:34-55.

    Columns of the output are (x, y, z): x = normalize(a1),
    z = normalize(x × a2), y = z × x.
    """
    x_raw = d6[..., 0:3]
    y_raw = d6[..., 3:6]
    x = _normalize(x_raw)
    z = _normalize(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack((x, y, z), axis=-1)


def rot6d_fixed_y_to_mat(d6: jnp.ndarray) -> jnp.ndarray:
    """Variant anchoring the y column first.  Reference rot_reps.py:57-67."""
    x_raw = d6[..., 0:3]
    y_raw = d6[..., 3:6]
    y = _normalize(y_raw)
    z = _normalize(jnp.cross(y, x_raw))
    x = jnp.cross(z, y)
    return jnp.stack((x, y, z), axis=-1)


def rot6d_fixed_x_to_mat(d6: jnp.ndarray) -> jnp.ndarray:
    """Reference rot_reps.py:69-79 (same construction as rot6d_to_mat)."""
    return rot6d_to_mat(d6)


def rot6d_fixed_z_to_mat(d6: jnp.ndarray) -> jnp.ndarray:
    """Variant anchoring the z column first.  Reference rot_reps.py:81-91."""
    y_raw = d6[..., 0:3]
    z_raw = d6[..., 3:6]
    z = _normalize(z_raw)
    x = _normalize(jnp.cross(z, y_raw))
    y = jnp.cross(x, z)
    return jnp.stack((x, y, z), axis=-1)


def mat_to_rot6d(rots: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> 6D by dropping the last column (rot_reps.py:93-105)."""
    return jnp.concatenate([rots[..., :, 0], rots[..., :, 1]], axis=-1)


def quat_to_mat(quat: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """(w,x,y,z) quaternion (not necessarily unit) -> rotation matrix.

    Reference pose_utils.py:348 (quat2mat_torch).
    """
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / jnp.maximum(norm, eps)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> unit quaternion (w,x,y,z), branch-free for jit.

    Uses the numerically-stable four-candidate construction: build the
    quaternion from each of the four diagonal dominance cases and select the
    one with the largest pivot (equivalent to transforms3d.mat2quat up to
    sign; we fix sign by making w >= 0).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate 0: pivot on trace
    s0 = safe_sqrt(tr + 1.0) * 2
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], axis=-1)
    # candidate 1: pivot m00
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    # candidate 2: pivot m11
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)
    # candidate 3: pivot m22
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    cond0 = (tr > 0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    q = _normalize(q)
    return q * jnp.sign(jnp.where(q[..., 0:1] == 0, 1.0, q[..., 0:1]))


def euler_to_mat(euler: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (radians) -> rotation matrix, matching the
    reference's euler2mat_batch EXACTLY (rot_reps.py:365-383): rotation
    order XZ'Y'' intrinsic — R = Rx(e0) @ Rz(e2) @ Ry(e1).  Note the
    unusual channel order: e0 about X, e2 about Z, e1 about Y."""
    c1, s1 = jnp.cos(euler[..., 0]), jnp.sin(euler[..., 0])  # X
    c2, s2 = jnp.cos(euler[..., 2]), jnp.sin(euler[..., 2])  # Z
    c3, s3 = jnp.cos(euler[..., 1]), jnp.sin(euler[..., 1])  # Y
    row0 = jnp.stack([c2 * c3, -s2, c2 * s3], axis=-1)
    row1 = jnp.stack([c1 * s2 * c3 + s1 * s3, c1 * c2,
                      c1 * s2 * s3 - s1 * c3], axis=-1)
    row2 = jnp.stack([s1 * s2 * c3 - c1 * s3, s1 * c2,
                      s1 * s2 * s3 + c1 * c3], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def axangle_to_mat(axis: jnp.ndarray, angle: jnp.ndarray,
                   eps: float = 1e-12) -> jnp.ndarray:
    """Rodrigues' formula, batched.  axis (...,3), angle (...)."""
    a = _normalize(axis, eps)
    x, y, z = a[..., 0], a[..., 1], a[..., 2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    C = 1 - c
    r00 = x * x * C + c
    r01 = x * y * C - z * s
    r02 = x * z * C + y * s
    r10 = y * x * C + z * s
    r11 = y * y * C + c
    r12 = y * z * C - x * s
    r20 = z * x * C - y * s
    r21 = z * y * C + x * s
    r22 = z * z * C + c
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def lie_vec_to_mat(vec: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """so(3) exponential map: (...,3) axis-angle vector -> (...,3,3).

    Covers the reference's ``*_lie_vec`` rot types
    (network/model_utils.py:303-304); the ``lie_algebra`` module those
    lines import is absent upstream, so we implement the standard expmap
    with a Taylor guard at theta ~ 0.
    """
    theta = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, eps)
    return axangle_to_mat(vec / safe, theta[..., 0])


def log_quat_to_mat(log_q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion exponential then quat->mat: (...,4) -> (...,3,3).

    Covers the reference's ``*_log_quat`` rot types
    (network/model_utils.py:300-302, latentfusion ``qexp``; module absent
    upstream).  exp([a, v]) = e^a (cos|v|, sin|v| v/|v|); the scalar
    factor cancels in the normalized quat->mat.
    """
    v = log_q[..., 1:]
    mag = jnp.linalg.norm(v, axis=-1, keepdims=True)
    safe = jnp.maximum(mag, 1e-8)
    w = jnp.cos(mag)
    xyz = jnp.sin(mag) * v / safe
    return quat_to_mat(jnp.concatenate([w, xyz], axis=-1))


def rot5d_to_mat(r5d: jnp.ndarray) -> jnp.ndarray:
    """(sin, cos, axis) 5-D rep -> (...,3,3) via Rodrigues.

    Reference rot_reps.py:169-226 (normalize_5d_rotation +
    rot5d_to_mat_batch, the unused ablation rep): sin/cos pair and axis
    are normalized independently, then the angle-axis rotation assembled.
    """
    sc = _normalize(r5d[..., :2], 1e-8)
    axis = _normalize(r5d[..., 2:5], 1e-8)
    s, c = sc[..., 0], sc[..., 1]
    angle = jnp.arctan2(s, c)
    return axangle_to_mat(axis, angle)


def ortho5d_to_mat(a: jnp.ndarray) -> jnp.ndarray:
    """Stereographic 5-D orthogonal rep -> (...,3,3).

    Reference rot_reps.py:255-285 (stereographic_unproject with axis=0 +
    ortho5d_to_mat_batch): scale the last three coords, unproject onto
    S^3 placing the new coordinate FIRST, renormalize the trailing three,
    and feed (a[:2], u) through the 6-D Gram-Schmidt map.
    """
    proj_scale = jnp.asarray([jnp.sqrt(2.0) + 1, jnp.sqrt(2.0) + 1,
                              jnp.sqrt(2.0)], a.dtype)
    v = a[..., 2:5] * proj_scale
    s2 = jnp.sum(v * v, axis=-1, keepdims=True)
    unproj = 2 * v / (s2 + 1)
    u = jnp.concatenate([(s2 - 1) / (s2 + 1), unproj], axis=-1)  # (...,4)
    norm = jnp.linalg.norm(u[..., 1:], axis=-1, keepdims=True)
    u = u / jnp.maximum(norm, 1e-12)
    return rot6d_to_mat(jnp.concatenate([a[..., :2], u], axis=-1))


def get_rot_mat(rot: jnp.ndarray, rot_type: str) -> jnp.ndarray:
    """Dispatch matching reference PoseNet.get_rot_mat (PoseNet.py:36-51)."""
    if rot_type in ("ego_quat", "allo_quat"):
        return quat_to_mat(rot)
    if rot_type in ("ego_log_quat", "allo_log_quat"):
        return log_quat_to_mat(rot)
    if rot_type in ("ego_lie_vec", "allo_lie_vec"):
        return lie_vec_to_mat(rot)
    if rot_type in ("ego_rot6d", "allo_rot6d", "allo_rot6d_sym"):
        return rot6d_to_mat(rot)
    if rot_type in ("allo_rot6d_sym_y", "allo_rot6d_y"):
        return rot6d_fixed_y_to_mat(rot)
    if rot_type == "allo_rot6d_z":
        return rot6d_fixed_z_to_mat(rot)
    if rot_type == "allo_rot6d_x":
        return rot6d_fixed_x_to_mat(rot)
    if rot_type == "euler":
        return euler_to_mat(rot)
    raise ValueError(f"Wrong pred_rot type: {rot_type}")
