"""Point-cloud augmentations (reference datasets/data_augmentation.py:
38-259, inherited from FS-Net).

These operate on depth-derived point clouds, NOCS points and model points.
On the reference's RGB pipeline they are imported by the engine but never
called (SURVEY.md §2.3); they are provided here — fully batched, jit-able,
probability gating by jax.random instead of a per-sample python loop — for
the depth-assisted training configurations.

All functions are batched over the leading dim and return updated copies
(functional, no in-place mutation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_object_frame(pc, rot, trans):
    return jnp.einsum("bij,bnj->bni", jnp.swapaxes(rot, -1, -2),
                      pc - trans[:, None, :])


def _to_camera_frame(pc_obj, rot, trans):
    return jnp.einsum("bij,bnj->bni", rot, pc_obj) + trans[:, None, :]


def defor_3d_bb(pc, rot, trans, size, nocs, model, sym, aug_bb):
    """Bounding-box anisotropic rescale (reference defor_3D_bb :38-81).

    y-symmetric samples share the x/z factor ((ex+ez)/2).  Returns
    (pc, size, nocs, model).
    """
    ex, ey, ez = aug_bb[:, 0], aug_bb[:, 1], aug_bb[:, 2]
    exz = (ex + ez) / 2
    is_sym = (sym[:, 0] == 1)
    fx = jnp.where(is_sym, exz, ex)
    fy = ey
    fz = jnp.where(is_sym, exz, ez)
    factors = jnp.stack([fx, fy, fz], axis=1)            # (B, 3)

    new_size = size * factors
    scale_aug = (jnp.linalg.norm(new_size, axis=1)
                 / jnp.linalg.norm(size, axis=1))        # (B,)

    pc_obj = _to_object_frame(pc, rot, trans) * factors[:, None, :]
    pc_new = _to_camera_frame(pc_obj, rot, trans)
    nocs_new = nocs * factors[:, None, :] / scale_aug[:, None, None]
    model_new = model * factors[:, None, :] / scale_aug[:, None, None]
    return pc_new, new_size, nocs_new, model_new


def defor_3d_bc(key, pc, rot, trans, size, model, nocs):
    """Box-cage y-linear rescale (reference defor_3D_bc :84-120, applied
    only to bowl/mug).  Returns (pc, size, model, nocs)."""
    b = pc.shape[0]
    k1, k2 = jax.random.split(key)
    ey_up = jax.random.uniform(k1, (b, 1), minval=0.8, maxval=1.2)
    ey_down = jax.random.uniform(k2, (b, 1), minval=0.8, maxval=1.2)

    pc_obj = _to_object_frame(pc, rot, trans)
    per_pt = ((pc_obj[:, :, 1] + size[:, 1:2] / 2) / size[:, 1:2]
              * (ey_up - ey_down) + ey_down)
    pc_obj = pc_obj.at[:, :, 0].multiply(per_pt)
    pc_obj = pc_obj.at[:, :, 2].multiply(per_pt)
    pc_new = _to_camera_frame(pc_obj, rot, trans)

    norm_s = size / jnp.linalg.norm(size, axis=1, keepdims=True)
    m_resize = ((model[:, :, 1] + norm_s[:, 1:2] / 2) / norm_s[:, 1:2]
                * (ey_up - ey_down) + ey_down)
    model = model.at[:, :, 0].multiply(m_resize)
    model = model.at[:, :, 2].multiply(m_resize)

    lx = 2 * jnp.maximum(model[:, :, 0].max(1), -model[:, :, 0].min(1))
    ly = model[:, :, 1].max(1) - model[:, :, 1].min(1)
    lz = model[:, :, 2].max(1) - model[:, :, 2].min(1)
    s_norm = jnp.linalg.norm(size, axis=1)
    size_new = jnp.stack([lx, ly, lz], axis=1) * s_norm[:, None]
    scale_aug = jnp.linalg.norm(jnp.stack([lx, ly, lz], axis=1), axis=1)
    model = model / scale_aug[:, None, None]

    n_resize = ((nocs[:, :, 1] + norm_s[:, 1:2] / 2) / norm_s[:, 1:2]
                * (ey_up - ey_down) + ey_down)
    nocs = nocs.at[:, :, 0].multiply(n_resize)
    nocs = nocs.at[:, :, 2].multiply(n_resize)
    nocs = nocs / scale_aug[:, None, None]
    return pc_new, size_new, model, nocs


def defor_3d_rt(pc, rot, trans, aug_t, aug_r):
    """Pose jitter (reference defor_3D_rt): rotate about the object frame
    by aug_r and shift by aug_t.  Returns (pc, rot, trans)."""
    pc_obj = _to_object_frame(pc, rot, trans)
    rot_new = jnp.einsum("bij,bjk->bik", rot, aug_r)
    trans_new = trans + aug_t
    pc_new = jnp.einsum("bij,bnj->bni", rot_new, pc_obj) \
        + trans_new[:, None, :]
    return pc_new, rot_new, trans_new


def defor_3d_pc(key, pc, r: float = 0.002):
    """Per-point jitter up to +-r meters (reference defor_3D_pc)."""
    noise = jax.random.uniform(key, pc.shape, minval=-r, maxval=r)
    return pc + noise


def pc_augment(key, pc, pc_nocs, data, aug_bb_pro=0.3, aug_rt_pro=0.3,
               aug_bc_pro=0.3, aug_pc_pro=0.2, aug_pc_r=0.002):
    """Batched driver (reference pc_augment :203-259): per-sample
    probability gates drawn from jax.random; box-cage applies only to
    bowl (cat 1) and mug (cat 5)."""
    b = pc.shape[0]
    keys = jax.random.split(key, 8)
    rot, trans = data["rotation"], data["translation"]
    size, model = data["real_size"], data["model_point"]

    gate_bb = jax.random.uniform(keys[0], (b,)) < aug_bb_pro
    pc2, size2, nocs2, model2 = defor_3d_bb(
        pc, rot, trans, size, pc_nocs, model, data["sym_info"],
        data["aug_bb"])
    pc = jnp.where(gate_bb[:, None, None], pc2, pc)
    size = jnp.where(gate_bb[:, None], size2, size)
    pc_nocs = jnp.where(gate_bb[:, None, None], nocs2, pc_nocs)
    model = jnp.where(gate_bb[:, None, None], model2, model)

    gate_rt = jax.random.uniform(keys[1], (b,)) < aug_rt_pro
    pc2, rot2, trans2 = defor_3d_rt(pc, rot, trans, data["aug_rt_t"],
                                    data["aug_rt_R"])
    pc = jnp.where(gate_rt[:, None, None], pc2, pc)
    rot = jnp.where(gate_rt[:, None, None], rot2, rot)
    trans = jnp.where(gate_rt[:, None], trans2, trans)

    cat = data["cat_id0"]
    gate_bc = ((jax.random.uniform(keys[2], (b,)) < aug_bc_pro)
               & ((cat == 1) | (cat == 5)))
    pc2, size2, model2, nocs2 = defor_3d_bc(keys[3], pc, rot, trans, size,
                                            model, pc_nocs)
    pc = jnp.where(gate_bc[:, None, None], pc2, pc)
    size = jnp.where(gate_bc[:, None], size2, size)
    model = jnp.where(gate_bc[:, None, None], model2, model)
    pc_nocs = jnp.where(gate_bc[:, None, None], nocs2, pc_nocs)

    gate_pc = jax.random.uniform(keys[4], (b,)) < aug_pc_pro
    pc2 = defor_3d_pc(keys[5], pc, aug_pc_r)
    pc = jnp.where(gate_pc[:, None, None], pc2, pc)

    out = dict(data)
    out["rotation"] = rot
    out["translation"] = trans
    out["real_size"] = size
    out["model_point"] = model
    return pc, pc_nocs, out
