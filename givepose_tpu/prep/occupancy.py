"""Object occupancy grids + face-sketch extraction.

Reference: prepare_data/save_occupancy.py — voxelize each model's point
cloud into a bounds-fit resolution^3 grid (voxelize_object, :63-120),
then extract a 6-face "sketch": for each boundary face, rays from the
face center mark the FIRST occupied cell in each direction
(get_sketch_from_face_ray, :169-198), closed with a 3x3 morphological
close.  Output: ``{split}_occupancy_res{N}.pkl`` keyed by instance.

Vectorized redesign: the reference marches every ray cell-by-cell in
Python; here all (ray, step) probe coordinates are precomputed as one
(R, S) integer grid per scan direction and the first hit per ray is an
argmax over the probed occupancy — same cells, same hits, no loops.
"""

from __future__ import annotations

import os
import pickle

import cv2
import numpy as np


def voxelize_object(points: np.ndarray, resolution: int = 16):
    """Bounds-fit binary occupancy (reference voxelize_object :63-120).

    Returns (voxels bool (r,r,r), counts (r,r,r), grid_range (6,),
    voxel_size (3,)).
    """
    lo = points[:, :3].min(axis=0) - 1e-15
    hi = points[:, :3].max(axis=0) + 1e-15
    voxel_size = (hi - lo) / resolution
    coords = np.floor((points[:, :3] - lo) / voxel_size).astype(np.int32)
    keep = ((coords >= 0) & (coords < resolution)).all(axis=1)
    coords = coords[keep]
    voxels = np.zeros((resolution,) * 3, bool)
    counts = np.zeros((resolution,) * 3, np.int32)
    np.add.at(counts, tuple(coords.T), 1)
    voxels[tuple(coords.T)] = True
    return voxels, counts, np.concatenate([lo, hi]), voxel_size


def _ray_probe_grid(resolution: int, ray_number: int = 180):
    """(x, y, valid) probe coords for every (ray, signed step), matching
    the reference's rounding/stride rules exactly."""
    center = resolution / 2
    xs, ys, ok = [], [], []
    for ray_index in range(ray_number):
        ang = np.pi / ray_number * ray_index
        if abs(ang - np.pi / 2) <= np.pi / 180 or abs(ang) <= np.pi / 180:
            continue
        slope = np.tan(ang)
        stride = min(1.0, abs(1.0 / slope))
        steps = np.arange(-(resolution // 2),
                          resolution // 2 + 1) * stride
        x = np.round(center + steps).astype(int)
        y = np.round(center + steps * slope).astype(int)
        # reference only rejects >= resolution; lower bound is implied
        # by |steps*min(1,..)| <= res/2
        valid = (x < resolution) & (y < resolution) & (x >= 0) & (y >= 0)
        xs.append(x)
        ys.append(y)
        ok.append(valid)
    return np.stack(xs), np.stack(ys), np.stack(ok)


def get_sketch_from_face_ray(face: np.ndarray,
                             ray_number: int = 180) -> np.ndarray:
    """First-occupied-cell-per-ray silhouette (reference :169-198)."""
    res = face.shape[0]
    x, y, ok = _ray_probe_grid(res, ray_number)
    hit = face[np.clip(x, 0, res - 1), np.clip(y, 0, res - 1)] & ok
    out = np.zeros_like(face, dtype=bool)
    for scan in (slice(None, None, 1), slice(None, None, -1)):
        h = hit[:, scan]
        rows = h.any(axis=1)
        first = h.argmax(axis=1)
        xi = x[:, scan][np.arange(len(first)), first][rows]
        yi = y[:, scan][np.arange(len(first)), first][rows]
        out[xi, yi] = True
    return out


def extract_face_sketch(voxels: np.ndarray, ray_number: int = 180):
    """6-face sketch occupancy + per-face voxel coords
    (reference extract_face_sketch :120-155)."""
    res = voxels.shape[0]
    faces = [voxels[:, res - 1, :], voxels[res - 1, :, :],
             voxels[:, :, res - 1], voxels[0, :, :],
             voxels[:, :, 0], voxels[:, 0, :]]
    sketch_occ = np.zeros((6, res, res))
    sketch_coords = []
    kernel = np.ones((3, 3), np.uint8)
    for i, f in enumerate(faces):
        valid = get_sketch_from_face_ray(np.asarray(f, bool), ray_number)
        valid = cv2.morphologyEx(valid.astype(np.uint8),
                                 cv2.MORPH_CLOSE, kernel).astype(bool)
        sketch_occ[i] = valid
        c1, c2 = np.where(valid)
        cf = np.full(len(c1), res - 1 if i <= 2 else 0)
        if i in (0, 5):
            coord = np.stack([c1, cf, c2])
        elif i in (1, 3):
            coord = np.stack([cf, c1, c2])
        else:
            coord = np.stack([c1, c2, cf])
        sketch_coords.append(coord.T)
    return sketch_occ, sketch_coords


def save_occupancy(data_dir: str, splits=("real_train", "real_test",
                                          "camera_train", "camera_val"),
                   resolution: int = 16, ray_number: int = 180,
                   log=print):
    """Dataset driver (reference save_occupancy.py:215-252): one
    occupancy+sketch dict per model instance, per split pkl."""
    outs = []
    for split in splits:
        src = os.path.join(data_dir, "obj_models", f"{split}.pkl")
        if not os.path.exists(src):
            continue
        with open(src, "rb") as f:
            model_info = pickle.load(f)
        occ = {}
        for inst, pts in model_info.items():
            voxels, counts, grid_range, voxel_size = voxelize_object(
                np.asarray(pts), resolution)
            sketch_occ, sketch_coords = extract_face_sketch(voxels,
                                                            ray_number)
            occ[inst] = {"voxels": voxels,
                         "sketch_occupancy": sketch_occ,
                         "sketch_coords": sketch_coords,
                         "grid_range": grid_range,
                         "voxel_size": voxel_size}
        out = os.path.join(data_dir, "obj_models",
                           f"{split}_occupancy_res{resolution}.pkl")
        with open(out, "wb") as f:
            pickle.dump(occ, f)
        log(f"save_occupancy: {split}: {len(occ)} models -> {out}")
        outs.append(out)
    return outs
