"""Symmetry handling: rotation banks and on-device closest-rotation search.

The reference resolves y-axis symmetry with a per-sample CPU numpy loop over
a bank of rotations (``losses/pose_loss.py:401-428`` get_closest_rot_batch,
:319-326 symmetry_rotation_matrix_y) — a GPU->CPU sync in the middle of every
training step.  Here the argmin over the bank is a batched einsum that stays
on device and fuses into the loss computation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def symmetry_rotation_bank_y(number: int = 30) -> np.ndarray:
    """(number,3,3) bank of rotations about +y.  Reference pose_loss.py:319-326."""
    theta = 2.0 * np.pi / number * np.arange(number)
    c, s = np.cos(theta), np.sin(theta)
    zeros = np.zeros_like(theta)
    ones = np.ones_like(theta)
    rows = np.stack([
        np.stack([c, zeros, s], axis=-1),
        np.stack([zeros, ones, zeros], axis=-1),
        np.stack([-s, zeros, c], axis=-1),
    ], axis=-2)
    return rows.astype(np.float64)


def closest_sym_rot(pred_rots: jnp.ndarray, gt_rots: jnp.ndarray,
                    sym_flags: jnp.ndarray,
                    bank: jnp.ndarray) -> jnp.ndarray:
    """Closest symmetric gt rotation, batched on device.

    For symmetric samples the closest gt is argmin over ``gt @ bank_k`` of
    the geodesic error to the prediction, i.e. argmax of
    trace(pred^T gt bank_k) (reference get_closest_rot, pose_loss.py:329-353,
    where re() minimization == trace maximization).

    Args:
      pred_rots: (B,3,3)
      gt_rots: (B,3,3)
      sym_flags: (B,) 1.0 for y-axis-symmetric samples, 0.0 otherwise
      bank: (K,3,3) rotation bank (jnp or np)

    Returns:
      (B,3,3) closest gt rotations (== gt_rots where sym_flag is 0).
    """
    # M_bk = pred^T @ gt @ bank_k; trace per (b,k)
    pg = jnp.einsum("bij,bik->bjk", pred_rots, gt_rots,
                    precision="highest")       # pred^T gt
    traces = jnp.einsum("bjk,nkj->bn", pg, bank,
                        precision="highest")              # tr(pred^T gt bank)
    best = jnp.argmax(traces, axis=1)                          # (B,)
    best_bank = jnp.take(bank, best, axis=0)                   # (B,3,3)
    gt_sym = jnp.matmul(gt_rots, best_bank, precision="highest")
    flag = sym_flags.reshape(-1, 1, 1).astype(gt_rots.dtype)
    return flag * gt_sym + (1.0 - flag) * gt_rots


# Per-category symmetry descriptors (reference datasets/load_data_nocs.py:472-489).
# Rows indexed by 1-based category id (bottle..mug); mug row depends on
# handle visibility so use sym_info(cat_id, mug_handle) below.
_SYM_TABLE = np.array([
    [1, 1, 0, 1],   # bottle
    [1, 1, 0, 1],   # bowl
    [0, 0, 0, 0],   # camera
    [1, 1, 1, 1],   # can
    [0, 1, 0, 0],   # laptop
    [0, 1, 0, 0],   # mug with visible handle
], dtype=np.int32)
_MUG_NO_HANDLE = np.array([1, 0, 0, 0], dtype=np.int32)


def sym_info_table() -> np.ndarray:
    return _SYM_TABLE.copy()


def sym_info(cat_id_1based: int, mug_handle: int = 1) -> np.ndarray:
    """Reference load_data_nocs.py:472-489 (get_sym_info)."""
    if cat_id_1based == 6 and mug_handle == 0:
        return _MUG_NO_HANDLE.copy()
    return _SYM_TABLE[cat_id_1based - 1].copy()
