"""Point-wise object/background labels from depth.

Reference: prepare_data/gen_pts.py — per instance, render the object's
VISIBLE depth at its GT pose (OpenGL there), back-project it to a model
point cloud, back-project the scene depth inside the bbox, and label every
scene point as object (1) iff it lies within 12 mm of any visible model
point (get_dis_all, gen_pts.py:31-46).  Output contract per object id:
``points/pose%08d.txt`` (N x 3, mm) + ``points_labs/lab%08d.txt`` (N x 1).

TPU-native redesign: the renderer is the jnp point-splat z-buffer
(prep.renderer.render_points) and the M x N nearest-distance test is one
batched jnp reduction instead of the reference's tiled numpy allocation.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax.numpy as jnp

from givepose_tpu.prep.renderer import render_points


def backproject_depth(depth_mm: np.ndarray, k: np.ndarray,
                      bbox=None) -> np.ndarray:
    """Depth (mm) -> (N, 3) camera-space points in mm.

    ``bbox`` (y1, y2, x1, x2) restricts to a window (reference
    depth_2_mesh_bbx); zero-depth pixels are dropped.
    """
    im_h, im_w = depth_mm.shape
    y1, y2, x1, x2 = bbox if bbox is not None else (0, im_h, 0, im_w)
    y1, x1 = max(0, int(y1)), max(0, int(x1))
    y2, x2 = min(im_h, int(y2)), min(im_w, int(x2))
    win = depth_mm[y1:y2, x1:x2].astype(np.float32)
    ys, xs = np.nonzero(win > 0)
    d = win[ys, xs]
    u = xs + x1
    v = ys + y1
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    return np.stack([(u - cx) * d / fx, (v - cy) * d / fy, d], axis=1)


def label_points(scene_pts: np.ndarray, vis_pts: np.ndarray,
                 threshold_mm: float = 12.0) -> np.ndarray:
    """1 for scene points within ``threshold_mm`` of any visible model
    point (reference get_dis_all dd=12, applied gen_pts.py:88)."""
    if len(vis_pts) == 0 or len(scene_pts) == 0:
        return np.zeros((len(scene_pts),), np.uint8)
    d2 = jnp.sum(
        (jnp.asarray(scene_pts)[:, None, :]
         - jnp.asarray(vis_pts)[None, :, :]) ** 2, axis=-1)
    return np.asarray(jnp.min(d2, axis=1)
                      < threshold_mm * threshold_mm).astype(np.uint8)


def instance_point_labels(depth_mm: np.ndarray, bbox, k: np.ndarray,
                          model_points_m: np.ndarray, rot: np.ndarray,
                          trans_m: np.ndarray, rng: np.random.Generator,
                          n_scene: int = 6000, n_vis: int = 1000,
                          threshold_mm: float = 12.0):
    """One instance -> (scene points (n_scene, 3) mm, labels) or None.

    Mirrors gen_pts.get_one: visible-part render, 1000-point visible
    subsample, 6000-point bbox scene sample (with replacement when
    short), <=10-match rejection.
    """
    im_h, im_w = depth_mm.shape
    # visible model depth at the GT pose (self-occlusion via z-buffer)
    _, vis_depth = render_points(
        jnp.asarray(model_points_m, jnp.float32),
        jnp.asarray(model_points_m, jnp.float32),  # colors unused
        jnp.asarray(rot, jnp.float32), jnp.asarray(trans_m, jnp.float32),
        jnp.asarray(k, jnp.float32), im_h=im_h, im_w=im_w)
    vis = backproject_depth(np.asarray(vis_depth) * 1000.0, k)
    if len(vis) > n_vis:
        vis = vis[rng.choice(len(vis), n_vis, replace=False)]

    scene = backproject_depth(depth_mm, k, bbox=bbox)
    if len(scene) == 0:
        return None
    replace = len(scene) < n_scene
    scene = scene[rng.choice(len(scene), n_scene, replace=replace)]

    labels = label_points(scene, vis, threshold_mm)
    if int(labels.sum()) <= 10:   # too little overlap: drop (ref :90-95)
        return None
    return scene, labels


def generate_point_labels(data_dir: str, out_dir: str,
                          source: str = "Real", split: str = "train",
                          seed: int = 0, n_scene: int = 6000,
                          n_vis: int = 1000, threshold_mm: float = 12.0,
                          log=print):
    """Dataset driver over the NOCS layout (reference get_point_wise_lab).

    Reads ``<source>/<split_list>.txt`` entries' ``*_depth.png`` +
    ``*_label.pkl`` and the obj_models pkl; writes per-object
    points/points_labs txt files under ``out_dir``.
    """
    from givepose_tpu.eval.load_eval import load_depth

    rng = np.random.default_rng(seed)
    list_file = os.path.join(
        data_dir, source,
        "train_list.txt" if split == "train" else
        ("test_list.txt" if source == "Real" else "val_list.txt"))
    with open(list_file) as f:
        entries = [line.strip() for line in f if line.strip()]

    model_file = {
        ("Real", "train"): "obj_models/real_train.pkl",
        ("Real", "test"): "obj_models/real_test.pkl",
        ("CAMERA", "train"): "obj_models/camera_train.pkl",
        ("CAMERA", "test"): "obj_models/camera_val.pkl",
    }[(source, split)]
    with open(os.path.join(data_dir, model_file), "rb") as f:
        models = pickle.load(f)

    from givepose_tpu.data.records import CAMERA_K, REAL_K
    k = CAMERA_K if source == "CAMERA" else REAL_K

    n_written = 0
    for idx, sub in enumerate(entries):
        base = os.path.join(data_dir, source, sub)
        depth = load_depth(base + "_depth.png")
        if depth is None:
            continue
        try:
            with open(base + "_label.pkl", "rb") as f:
                lab = pickle.load(f)
        except Exception:
            continue
        for i, obj in enumerate(lab["model_list"]):
            if obj not in models:
                continue
            y1, x1, y2, x2 = lab["bboxes"][i]
            # obj_models pkls store NOCS-normalized points; metric =
            # normalized * nocs scale (labels' 'scales')
            mpts = models[obj] * float(lab["scales"][i])
            out = instance_point_labels(
                depth.astype(np.float32), (y1, y2, x1, x2), k,
                mpts, lab["rotations"][i],
                lab["translations"][i], rng,
                n_scene=n_scene, n_vis=n_vis, threshold_mm=threshold_mm)
            if out is None:
                continue
            pts, labels = out
            pdir = os.path.join(out_dir, obj, "points")
            ldir = os.path.join(out_dir, obj, "points_labs")
            os.makedirs(pdir, exist_ok=True)
            os.makedirs(ldir, exist_ok=True)
            np.savetxt(os.path.join(pdir, f"pose{idx:08d}.txt"), pts,
                       fmt="%f", delimiter=" ")
            np.savetxt(os.path.join(ldir, f"lab{idx:08d}.txt"),
                       labels[:, None], fmt="%d")
            n_written += 1
    log(f"gen_pts: wrote {n_written} instances to {out_dir}")
    return n_written
