"""Pose error metrics (batched).  Reference network/pose_utils/pose_error.py
(re/te) and losses/pose_loss.py:451-466."""

from __future__ import annotations

import jax.numpy as jnp


def rotation_error_deg(R_est: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation error in degrees (reference pose_loss.py:451-466).

    Accepts (...,3,3); trace is clamped into the valid acos domain exactly as
    the reference does (trace<=3, cos in [-1,1]).
    """
    diff = jnp.matmul(R_est, jnp.swapaxes(R_gt, -1, -2),
                      precision="highest")
    trace = jnp.trace(diff, axis1=-2, axis2=-1)
    trace = jnp.minimum(trace, 3.0)
    cos = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    return jnp.rad2deg(jnp.arccos(cos))


def translation_error(t_est: jnp.ndarray, t_gt: jnp.ndarray) -> jnp.ndarray:
    """L2 translation error (reference pose_error.py te)."""
    return jnp.linalg.norm(t_est - t_gt, axis=-1)
