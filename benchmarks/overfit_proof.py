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
        sn_steps: int | None = None, seed: int = 0) -> dict:
    from givepose_tpu.data.synthetic import (
        make_synthetic_eval,
        make_synthetic_nocs,
    )

    root = tempfile.mkdtemp(prefix="overfit_")
    n_images = 6
    # identical scenes in both splits: same seed drives the same rng draws
    data_dir, ivfc_dir = make_synthetic_nocs(root, n_images=n_images,
                                             seed=seed, split="train",
                                             source="Real")
    make_synthetic_eval(root, n_images=n_images, seed=seed)

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
        # mask deformation.  Eval crops now go through the SAME
        # resampler arithmetic as training (ops/resample host mirrors),
        # so zero jitter memorizes the exact pixels eval serves.
        "--DZI_TYPE", "uniform",
        "--DZI_SCALE_RATIO", "0",
        "--DZI_SHIFT_RATIO", "0",
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

    # Each phase runs in its OWN process: the axon frontend retains a
    # host-side buffer per unique host->device transfer, so pose
    # training + scale training + eval in one process OOMs the 128 GB
    # host (observed: SIGKILL at sn step ~450 after a 2500-step pose
    # run).  Checkpoints on disk carry state between phases — the same
    # mechanism cli.train_durable uses for long campaigns.
    import subprocess

    save = os.path.join(root, "run")
    sn_save = os.path.join(root, "run_sn")
    log_every = str(max(1, min(50, steps)))

    import jax

    env = dict(os.environ)
    if (jax.config.jax_platforms or "") == "cpu":
        env["OVERFIT_FORCE_CPU"] = "1"   # CPU smoke: propagate backend
    prologue = ("import os\n"
                "if os.environ.get('OVERFIT_FORCE_CPU'):\n"
                "    import jax\n"
                "    jax.config.update('jax_platforms', 'cpu')\n")

    def phase(code, ok=(0,)):
        r = subprocess.run([sys.executable, "-c", prologue + code],
                           env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        assert r.returncode in ok, f"phase failed rc={r.returncode}"
        return r.returncode

    # The pose phase re-execs itself every 60 epochs (900 steps at
    # train_size 60 / batch 4) via the cli.train restart_every seam: the
    # axon frontend retains ~54 MB of host RAM per step (unique
    # host->device transfers), so a single 2500-step process crosses the
    # 128 GB OOM cliff (observed kill at step ~2200, anon-rss 130 GB).
    # Orbax resume is exact (step, opt state, sampler stream), same
    # mechanism as cli.train_durable.  The persistent compilation cache
    # spares each re-exec'd round the multi-minute train-step recompile.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    rounds = 0
    while True:
        resume = ['"--resume", "1",'] if rounds else []
        rc = phase(f"""
from givepose_tpu.cli.train import train
train({common!r} + [{''.join(resume)} "--model_save", {save!r},
      "--restart_every", "60", "--log_every", {log_every!r}],
      max_steps={steps}, backbone_variant="tiny")
""", ok=(0, 75))
        rounds += 1
        if rc == 0:
            break
        assert rounds < 20, "restart loop runaway"
    with open(os.path.join(save, "metrics.jsonl")) as f:
        last = json.loads(f.readlines()[-1])
    final_loss = last.get("total_loss", float("nan"))
    print(f"final train loss after {steps} steps: {final_loss:.4f}")

    phase(f"""
from givepose_tpu.cli.train_scale import train_scale
train_scale({common!r} + ["--model_save", {sn_save!r}, "--log_every",
            {log_every!r}], max_steps={sn_steps or min(steps, 800)})
""")

    from givepose_tpu.core.checkpoint import latest_checkpoint
    from givepose_tpu.cli.evaluate import evaluate

    sn_ckpts = [d for d in os.listdir(sn_save)
                if d.startswith("scale_ckpt_")]
    sn_ckpts.sort(key=lambda d: int(d.split("_")[-1]))
    summary = evaluate(
        common + ["--model_save", os.path.join(root, "eval_out"),
                  "--eval.max_instances", "4",
                  "--resume_model", latest_checkpoint(save),
                  "--sn_path", os.path.join(sn_save, sn_ckpts[-1])],
        backbone_variant="tiny")
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

    # --- bisection diagnostics: re-score the cached predictions with GT
    # substituted for one factor at a time (scale-net metric scale, size
    # head extents, full pose), isolating which term limits IoU.  The
    # fixture has one instance per image and GT-as-detections, so pred i
    # matches gt i by construction.
    from givepose_tpu.eval.harness import compute_degree_cm_map
    from givepose_tpu.eval.metrics import SYNSET_NAMES

    import glob

    cache = glob.glob(os.path.join(root, "eval_out", "eval_result_*",
                                   "pred_result.pkl"))[0]
    with open(cache, "rb") as f:
        results = pickle.load(f)

    def rescore(make_variant):
        import copy

        variant = []
        for r in results:
            r2 = copy.deepcopy(r)
            make_variant(r2)
            variant.append(r2)
        iou_aps, pose_aps = compute_degree_cm_map(
            variant, SYNSET_NAMES, (5, 10, 360), (5, 10, 1e4),
            (0.1, 0.25, 0.5, 0.75), iou_pose_thres=0.1,
            use_matches_for_pose=True)
        return {
            "IoU25": float(np.mean(np.asarray(iou_aps)[rows, 1])) * 100,
            "IoU50": float(np.mean(np.asarray(iou_aps)[rows, 2])) * 100,
            "IoU75": float(np.mean(np.asarray(iou_aps)[rows, 3])) * 100,
            "10d10cm": float(np.mean(
                np.asarray(pose_aps)[rows, 1, 1])) * 100,
        }

    def sub_gt_scale(r):
        n = min(len(r["pred_RTs"]), len(r["gt_RTs"]))
        for i in range(n):
            s_pred = np.cbrt(np.linalg.det(r["pred_RTs"][i, :3, :3]))
            s_gt = np.cbrt(np.linalg.det(r["gt_RTs"][i][:3, :3]))
            r["pred_RTs"][i, :3, :] *= s_gt / max(s_pred, 1e-8)

    def sub_gt_size(r):
        n = min(len(r["pred_scales"]), len(r["gt_scales"]))
        r["pred_scales"][:n] = np.asarray(r["gt_scales"])[:n]

    def sub_gt_pose(r):
        n = min(len(r["pred_RTs"]), len(r["gt_RTs"]))
        r["pred_RTs"][:n] = np.asarray(r["gt_RTs"])[:n]

    diagnostics = {
        "gt_scale": rescore(sub_gt_scale),
        "gt_size": rescore(sub_gt_size),
        "gt_scale_and_size": rescore(lambda r: (sub_gt_scale(r),
                                                sub_gt_size(r))),
        "gt_pose_and_scale": rescore(sub_gt_pose),
    }
    print("diagnostics (GT-substitution bisection):")
    for k, v in diagnostics.items():
        print(f"  {k}: {v}")

    import jax

    out = {
        "backend": jax.devices()[0].platform,
        "steps": steps,
        "final_loss": float(final_loss),
        "absolute_mAP": absolute,
        "seed": seed,
        "present_classes": rows,
        "present_class_mAP": present_mAP,
        "diagnostics": diagnostics,
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
    sd = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    run(n, dst, seed=sd)
