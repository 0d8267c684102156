"""Object-model sampling + occupancy voxelization.

Reference prepare_data/shape_data.py:10-80 (save_nocs_model_to_file /
save_model_to_hdf5: sample 1024 surface points per model into
obj_models/*.pkl) and save_occupancy.py:8-199 (voxelize_object).  The
samplers here are numpy/jnp (no trimesh dependency): OBJ parsing is a
20-line reader, surface sampling is area-weighted triangle sampling, and
voxelization is a jnp histogram.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax.numpy as jnp


def load_obj(path: str):
    """Minimal OBJ reader -> (vertices (V,3), faces (F,3) int)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1
                       for tok in line.split()[1:4]]
                faces.append(idx)
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int = 1024,
                   seed: int = 0) -> np.ndarray:
    """Area-weighted uniform surface sampling."""
    rng = np.random.default_rng(seed)
    tri = verts[faces]                                  # (F, 3, 3)
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    if area.sum() == 0:
        sel = rng.choice(len(verts), n)
        return verts[sel]
    probs = area / area.sum()
    fsel = rng.choice(len(faces), n, p=probs)
    u = rng.random((n, 1))
    v = rng.random((n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    t = tri[fsel]
    return (t[:, 0] + u * (t[:, 1] - t[:, 0])
            + v * (t[:, 2] - t[:, 0]))


def normalize_to_nocs(points: np.ndarray) -> tuple[np.ndarray, float]:
    """Center + scale by the tight-bbox diagonal (NOCS convention).

    Returns (normalized points, diagonal length)."""
    mins, maxs = points.min(0), points.max(0)
    center = (mins + maxs) / 2
    diag = float(np.linalg.norm(maxs - mins))
    return (points - center) / diag, diag


def save_model_points(model_dir: str, out_pkl: str, n_points: int = 1024,
                      log=print) -> dict:
    """Walk <model_dir>/**/*.obj and write {name: (n,3)} pkl
    (reference save_nocs_model_to_file)."""
    models = {}
    for root, _, files in os.walk(model_dir):
        for fn in files:
            if not fn.endswith(".obj"):
                continue
            path = os.path.join(root, fn)
            name = os.path.relpath(path, model_dir).replace(
                os.sep, "/")[:-4]
            verts, faces = load_obj(path)
            if len(verts) == 0:
                log(f"skip empty {name}")
                continue
            pts = (sample_surface(verts, faces, n_points)
                   if len(faces) else verts[:n_points])
            pts, _ = normalize_to_nocs(pts)
            models[name] = pts.astype(np.float32)
    os.makedirs(os.path.dirname(out_pkl) or ".", exist_ok=True)
    with open(out_pkl, "wb") as f:
        pickle.dump(models, f)
    return models


def voxelize(points: np.ndarray, resolution: int = 32) -> np.ndarray:
    """Occupancy grid over the NOCS cube [-0.5, 0.5]^3
    (reference save_occupancy.voxelize_object)."""
    idx = jnp.clip(((jnp.asarray(points) + 0.5) * resolution
                    ).astype(jnp.int32), 0, resolution - 1)
    flat = (idx[:, 0] * resolution + idx[:, 1]) * resolution + idx[:, 2]
    grid = jnp.zeros((resolution ** 3,), jnp.float32)
    grid = grid.at[flat].set(1.0)
    return np.asarray(grid.reshape(resolution, resolution, resolution))
