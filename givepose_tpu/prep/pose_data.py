"""Offline dataset annotation (reference prepare_data/pose_data.py).

The reference's annotate_* functions (:127-381) align GT NOCS maps to the
depth map per instance with a sequential numpy RANSAC-Umeyama
(tools/align_utils.py:128-161) and write *_label.pkl.  Here the alignment
is the jitted batched RANSAC from givepose_tpu.geometry — all 128
hypotheses in parallel on the accelerator — and the driver walks a split
writing the same pkl schema the training reader consumes.
"""

from __future__ import annotations

import os
import pickle

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from givepose_tpu.data.records import decode_nocs_coord
from givepose_tpu.geometry import ransac_umeyama


def load_depth_png(path: str) -> np.ndarray | None:
    """16-bit (or composite-encoded) depth decode
    (reference tools/eval_utils.py:141-155)."""
    depth = cv2.imread(path, -1)
    if depth is None:
        return None
    if depth.ndim == 3:
        d16 = (depth[:, :, 1].astype(np.int32) * 256
               + depth[:, :, 2].astype(np.int32))
        d16 = np.where(d16 == 32001, 0, d16)
        return d16.astype(np.uint16)
    if depth.ndim == 2 and depth.dtype == np.uint16:
        return depth
    raise ValueError(f"unsupported depth format: {path}")


def align_instance(nocs_coord: np.ndarray, depth: np.ndarray,
                   mask: np.ndarray, intrinsics: np.ndarray,
                   max_points: int = 2048, key=None):
    """One instance NOCS->depth similarity fit.

    Returns (scale, rotation, translation) in the reference's units
    (pose_data annotate_*: depth in mm -> scale/1000, trans/1000).
    """
    ys, xs = np.where((mask > 0) & (depth > 0))
    if len(ys) < 5:
        return None
    if len(ys) > max_points:
        sel = np.random.default_rng(0).choice(len(ys), max_points,
                                              replace=False)
        ys, xs = ys[sel], xs[sel]
    z = depth[ys, xs].astype(np.float64)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    pts = np.stack([(xs - cx) * z / fx, (ys - cy) * z / fy, z], axis=1)
    src = nocs_coord[ys, xs].astype(np.float64)

    out = ransac_umeyama(jnp.asarray(src, jnp.float32),
                         jnp.asarray(pts, jnp.float32),
                         key=key if key is not None
                         else jax.random.PRNGKey(0))
    return (float(out["scale"]) / 1000.0,
            np.asarray(out["rotation"], np.float64),
            np.asarray(out["translation"], np.float64) / 1000.0)


def annotate_image(img_path: str, intrinsics: np.ndarray,
                   mug_meta=None) -> dict | None:
    """Produce the *_label.pkl payload for one image from its raw
    color/mask/coord/depth + meta files (reference process_data +
    annotate loop, pose_data.py:49-381)."""
    meta_path = img_path + "_meta.txt"
    if not os.path.exists(meta_path):
        return None
    mask_png = cv2.imread(img_path + "_mask.png")
    depth = load_depth_png(img_path + "_depth.png")
    if mask_png is None or depth is None:
        return None
    mask_ch = mask_png[:, :, 2]

    inst_ids, cls_ids, model_list = [], [], []
    with open(meta_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            inst_ids.append(int(parts[0]))
            cls_ids.append(int(parts[1]))
            model_list.append(parts[-1])

    scales, rotations, translations, bboxes, keep = [], [], [], [], []
    for k, (inst, cls, mname) in enumerate(
            zip(inst_ids, cls_ids, model_list)):
        inst_mask = (mask_ch == inst).astype(np.float32)
        if inst_mask.sum() < 16:
            continue
        nocs = decode_nocs_coord(img_path + "_coord.png", mug_meta,
                                 mname, cls - 1)
        if nocs is None:
            continue
        fit = align_instance(nocs, depth, inst_mask, intrinsics,
                             key=jax.random.PRNGKey(k))
        if fit is None:
            continue
        s, r, t = fit
        ys, xs = np.where(inst_mask > 0)
        bboxes.append([ys.min(), xs.min(), ys.max(), xs.max()])
        scales.append(s)
        rotations.append(r)
        translations.append(t)
        keep.append(k)

    if not keep:
        return None
    return {
        "instance_ids": np.asarray([inst_ids[k] for k in keep]),
        "class_ids": np.asarray([cls_ids[k] for k in keep]),
        "model_list": [model_list[k] for k in keep],
        "bboxes": np.asarray(bboxes),
        "scales": np.asarray(scales, np.float32),
        "rotations": np.asarray(rotations, np.float32),
        "translations": np.asarray(translations, np.float32),
        "poses": np.asarray([
            np.hstack([r, t[:, None]])
            for r, t in zip(rotations, translations)], np.float32),
    }


def annotate_split(data_dir: str, list_file: str, intrinsics: np.ndarray,
                   mug_meta=None, log=print) -> int:
    """Walk a split list and write *_label.pkl next to each image."""
    with open(os.path.join(data_dir, list_file)) as f:
        entries = [line.strip() for line in f if line.strip()]
    n = 0
    prefix = list_file.split("/")[0]
    for sub in entries:
        img_path = os.path.join(data_dir, prefix, sub) \
            if not sub.startswith(prefix) else os.path.join(data_dir, sub)
        gts = annotate_image(img_path, intrinsics, mug_meta)
        if gts is None:
            log(f"skip {sub}")
            continue
        with open(img_path + "_label.pkl", "wb") as f:
            pickle.dump(gts, f)
        n += 1
    return n
