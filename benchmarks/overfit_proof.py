"""End-to-end learning proof: overfit PoseNet on the synthetic fixture,
then run the REAL eval driver with the trained weights.

This closes the train->eval loop the reference exercises implicitly
(engine/train.py:115-154 -> evaluation/evaluate.py:141-203): the same
scenes are written to both the train and test splits (same seed), the
pose net + scale net are overfit with augmentation disabled, and the
standard eval driver must then report near-perfect mAP from *predicted*
poses.

Usage (real TPU or CPU):
    python benchmarks/overfit_proof.py [steps] [out_json]

Writes a JSON artifact (default OVERFIT.json) with the final loss, the
absolute-mAP summary, and pass/fail flags (IoU25 >= 95, 5d5cm >= 80).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np


def run(steps: int = 600, out_json: str = "OVERFIT.json",
        steps_per_epoch: int = 10, lr: float = 1e-3,
        img_size: int = 64, out_res: int = 16,
        sn_steps: int | None = None) -> dict:
    from givepose_tpu.data.synthetic import (
        make_synthetic_eval,
        make_synthetic_nocs,
    )

    root = tempfile.mkdtemp(prefix="overfit_")
    n_images = 6
    # identical scenes in both splits: same seed drives the same rng draws
    data_dir, ivfc_dir = make_synthetic_nocs(root, n_images=n_images,
                                             seed=0, split="train",
                                             source="Real")
    make_synthetic_eval(root, n_images=n_images, seed=0)

    common = [
        "--dataset", "Real",
        "--dataset_dir", data_dir,
        "--data.ivfc_dir", ivfc_dir,
        "--img_size", str(img_size),
        "--out_res", str(out_res),
        "--model.compute_dtype", "float32",
        # determinism for memorization: zero-jitter DZI (uniform with
        # zero ratios keeps the 1.5x pad the eval loader applies — the
        # reference's DZI 'none' branch drops the pad and trains on
        # crops 1.5x tighter than eval ever sees), no color aug, no
        # mask deformation
        "--DZI_TYPE", "uniform",
        # light jitter: the eval loader's cv2 crops differ from the
        # train-time matmul resampler by ~1px rounding; a zero-jitter
        # memorization is brittle to that (17-63deg eval rot error off a
        # 3deg train fit), +-10% jitter makes the fit robust
        "--DZI_SCALE_RATIO", "0.1",
        "--DZI_SHIFT_RATIO", "0.1",
        "--color_aug_prob", "0",
        "--data.roi_mask_pro", "0",
        "--batch_size", "4",   # axon frontend retains ~9MB host-side per transferred image-batch; batch 4 keeps a 2500-step run under the 128GB host RAM (batch 6 OOMs ~step 1950)
        # several steps per epoch amortize the per-epoch host pipeline
        # rebuild (the 4 images are drawn with repetition)
        "--train_size", str(6 * steps_per_epoch),
        "--warmup_iters", "20",
        "--lr", str(lr),
        "--total_epoch", str(max(1, steps // steps_per_epoch)),
        "--save_every", "1000000",
    ]

    from givepose_tpu.cli.train import train

    save = os.path.join(root, "run")
    log_every = str(max(1, min(50, steps)))
    state = train(common + ["--model_save", save,
                            "--log_every", log_every],
                  max_steps=steps, backbone_variant="tiny")
    with open(os.path.join(save, "metrics.jsonl")) as f:
        last = json.loads(f.readlines()[-1])
    final_loss = last.get("total_loss", float("nan"))
    print(f"final train loss after {steps} steps: {final_loss:.4f}")

    from givepose_tpu.cli.train_scale import train_scale

    sn_state = train_scale(
        common + ["--model_save", os.path.join(root, "run_sn"),
                  "--log_every", log_every],
        max_steps=sn_steps or min(steps, 800))

    from givepose_tpu.cli.evaluate import evaluate

    summary = evaluate(
        common + ["--model_save", os.path.join(root, "eval_out"),
                  "--eval.max_instances", "4"],
        backbone_variant="tiny",
        posenet_variables={"params": state.params,
                           "batch_stats": state.batch_stats},
        scalenet_variables={"params": sn_state.params,
                            "batch_stats": sn_state.batch_stats})
    absolute = summary["absolute"]
    print("absolute mAP:", absolute)

    # The harness means over ALL 6 categories (reference convention);
    # the tiny fixture only instantiates a few, so also report the mean
    # over categories that actually appear — that is the pass metric.
    import pickle

    present = set()
    scene = os.path.join(data_dir, "Real/test/scene_1")
    for fn in sorted(os.listdir(scene)):
        if fn.endswith("_label.pkl"):
            with open(os.path.join(scene, fn), "rb") as f:
                present.update(int(c) for c in pickle.load(f)["class_ids"])
    iou_aps = np.asarray(summary["iou_aps"])     # (C+1, n_iou)
    pose_aps = np.asarray(summary["pose_aps"])   # (C+1, n_deg, n_shift)
    rows = sorted(present)
    present_mAP = {
        "IoU25": float(np.mean(iou_aps[rows, 1])) * 100,
        "IoU50": float(np.mean(iou_aps[rows, 2])) * 100,
        "IoU75": float(np.mean(iou_aps[rows, 3])) * 100,
        "5d5cm": float(np.mean(pose_aps[rows, 0, 0])) * 100,
        "10d10cm": float(np.mean(pose_aps[rows, 1, 1])) * 100,
        "10d": float(np.mean(pose_aps[rows, 1, -1])) * 100,
        "10cm": float(np.mean(pose_aps[rows, -1, 1])) * 100,
    }
    print("present-class mAP:", present_mAP)

    import jax

    out = {
        "backend": jax.devices()[0].platform,
        "steps": steps,
        "final_loss": float(final_loss),
        "absolute_mAP": absolute,
        "present_classes": rows,
        "present_class_mAP": present_mAP,
        "pass_iou25": present_mAP["IoU25"] >= 95.0,
        "pass_10d10cm": present_mAP["10d10cm"] >= 80.0,
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    dst = sys.argv[2] if len(sys.argv) > 2 else "OVERFIT.json"
    run(n, dst)
