"""Result visualization (reference tools/vis_utils.py + evaluation/
colormap.py subset used by the eval path): project 3D boxes onto images,
render NOCS maps, per-class colormap."""

from __future__ import annotations

import numpy as np

from givepose_tpu.eval.metrics import box_corners, transform_corners

# Detectron-style colormap head (reference evaluation/colormap.py)
_COLORS = np.array([
    [0.000, 0.447, 0.741], [0.850, 0.325, 0.098], [0.929, 0.694, 0.125],
    [0.494, 0.184, 0.556], [0.466, 0.674, 0.188], [0.301, 0.745, 0.933],
    [0.635, 0.078, 0.184], [0.300, 0.300, 0.300], [0.600, 0.600, 0.600],
    [1.000, 0.000, 0.000],
])


def class_color(cls_id: int) -> tuple[int, int, int]:
    c = (_COLORS[cls_id % len(_COLORS)] * 255).astype(int)
    return int(c[0]), int(c[1]), int(c[2])


_BOX_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7),
              (6, 7), (0, 4), (1, 5), (2, 6), (3, 7)]


def project_box(rt: np.ndarray, scale: np.ndarray,
                k: np.ndarray) -> np.ndarray:
    """(4,4) sRT + (3,) normalized extents -> (8,2) pixel corners."""
    corners = transform_corners(box_corners(scale), rt)     # (3, 8)
    proj = k @ corners
    return (proj[:2] / proj[2:3]).T


def draw_box(image: np.ndarray, rt: np.ndarray, scale: np.ndarray,
             k: np.ndarray, color=(0, 255, 0),
             thickness: int = 2) -> np.ndarray:
    """Draw a projected 3D box in place (reference draw_detections)."""
    import cv2

    pts = project_box(rt, scale, k).astype(int)
    for a, b in _BOX_EDGES:
        cv2.line(image, tuple(pts[a]), tuple(pts[b]), color, thickness)
    return image


def draw_results(image: np.ndarray, result: dict,
                 k: np.ndarray, draw_gt: bool = True) -> np.ndarray:
    """Overlay predicted (class-colored) and GT (green) boxes."""
    img = image.copy()
    if draw_gt:
        for rt, sc in zip(np.asarray(result["gt_RTs"]).reshape(-1, 4, 4),
                          np.asarray(result["gt_scales"]).reshape(-1, 3)):
            draw_box(img, rt, sc, k, color=(0, 255, 0), thickness=1)
    for rt, sc, cid in zip(
            np.asarray(result["pred_RTs"]).reshape(-1, 4, 4),
            np.asarray(result["pred_scales"]).reshape(-1, 3),
            np.asarray(result["pred_class_ids"]).reshape(-1)):
        draw_box(img, rt, sc, k, color=class_color(int(cid)))
    return img


def nocs_map_to_rgb(coor: np.ndarray) -> np.ndarray:
    """[-0.5, 0.5] NOCS map -> uint8 visualization."""
    return np.clip((np.asarray(coor) + 0.5) * 255, 0, 255).astype(np.uint8)
