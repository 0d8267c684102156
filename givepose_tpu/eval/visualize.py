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


_CURVE_STYLE = [
    ("tab:blue", "-"), ("tab:orange", "-"), ("tab:green", "-"),
    ("tab:pink", "-"), ("tab:olive", "-"), ("tab:purple", "-"),
    ("tab:red", "--"), ("tab:gray", ":"),
]


def plot_map_curves(iou_aps: np.ndarray, pose_aps: np.ndarray,
                    out_dir: str, iou_thres_list, degree_thres_list,
                    shift_thres_list, class_names=None,
                    save_pkl: bool = True) -> str:
    """Three-panel AP-curve figure + results pickle.

    Reference behavior: evaluation/eval_utils.py:467-515 (plot_mAP) plus
    the mAP_Acc.pkl dump at :452-464.  Panels: AP vs 3D-IoU threshold,
    AP vs rotation threshold at the loosest shift, AP vs shift threshold
    at the loosest rotation.  Class axis layout matches our harness
    (``compute_degree_cm_map``): rows 1..C-1 are real classes, row -1 is
    the class mean (drawn dashed red like the reference's 'mean').

    Returns the path of the saved PNG.
    """
    import os

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from givepose_tpu.eval.metrics import SYNSET_NAMES

    names = list(class_names or SYNSET_NAMES[1:]) + ["mean"]
    iou_t = np.asarray(iou_thres_list, np.float64)
    deg_t = np.asarray(degree_thres_list, np.float64)
    sft_t = np.asarray(shift_thres_list, np.float64)
    # rows to draw: real classes then the mean row (-1)
    rows = list(range(1, iou_aps.shape[0] - 1)) + [iou_aps.shape[0] - 1]

    fig, (ax_iou, ax_deg, ax_sft) = plt.subplots(1, 3, figsize=(8, 3.5))
    ax_iou.set_title("3D IoU", fontsize=10)
    ax_iou.set_ylabel("Average Precision")
    ax_iou.set_ylim(0, 100)
    ax_iou.set_xlabel("Percent")
    ax_iou.set_xlim(0, 100)
    ax_iou.grid()
    ax_deg.set_title("Rotation", fontsize=10)
    ax_deg.set_ylim(0, 100)
    ax_deg.yaxis.set_ticklabels([])
    ax_deg.set_xlabel("Degree")
    ax_deg.grid()
    ax_sft.set_title("Translation", fontsize=10)
    ax_sft.set_ylim(0, 100)
    ax_sft.yaxis.set_ticklabels([])
    ax_sft.set_xlabel("Centimeter")
    ax_sft.grid()
    for j, row in enumerate(rows):
        color, style = _CURVE_STYLE[j % len(_CURVE_STYLE)]
        label = names[j] if j < len(names) else f"cls{row}"
        ax_iou.plot(100 * iou_t, 100 * iou_aps[row, :len(iou_t)],
                    color=color, linestyle=style, label=label)
        ax_deg.plot(deg_t, 100 * pose_aps[row, :len(deg_t), -1],
                    color=color, linestyle=style, label=label)
        ax_sft.plot(sft_t, 100 * pose_aps[row, -1, :len(sft_t)],
                    color=color, linestyle=style, label=label)
    ax_sft.legend(loc="lower right", fontsize="small")
    fig.tight_layout()
    png_path = os.path.join(out_dir, "mAP.png")
    fig.savefig(png_path)
    plt.close(fig)

    if save_pkl:
        import pickle

        with open(os.path.join(out_dir, "mAP_Acc.pkl"), "wb") as f:
            pickle.dump({
                "iou_thres_list": list(iou_thres_list),
                "degree_thres_list": list(degree_thres_list),
                "shift_thres_list": list(shift_thres_list),
                "iou_aps": iou_aps,
                "pose_aps": pose_aps,
            }, f)
    return png_path
