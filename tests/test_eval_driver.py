"""End-to-end evaluation driver tests on the synthetic test split."""

import numpy as np
import jax
import pytest

from givepose_tpu.core.config import Config, DataConfig, EvalConfig, \
    ModelConfig
from givepose_tpu.data.synthetic import make_synthetic_eval
from givepose_tpu.eval import (
    NocsEvalReader,
    build_instance_batch,
    compute_degree_cm_map,
    evaluate_results,
    run_inference,
)
from givepose_tpu.models import PoseNet, ScaleNet


@pytest.fixture(scope="module")
def synth_eval(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_eval")
    return make_synthetic_eval(str(root), n_images=3)


class TestEvalReader:
    def test_reads_detections(self, synth_eval):
        data_dir, _ = synth_eval
        reader = NocsEvalReader("Real", data_dir)
        assert len(reader) == 3
        item = reader.read(0)
        assert item is not None
        image, det, cam_k = item
        assert image.shape == (480, 640, 3)
        assert det["pred_masks"].shape[:2] == (480, 640)
        assert len(det["gt_RTs"]) == len(det["gt_class_ids"])

    def test_instance_batch_static_shapes(self, synth_eval):
        data_dir, _ = synth_eval
        reader = NocsEvalReader("Real", data_dir)
        image, det, cam_k = reader.read(0)
        batch, keep = build_instance_batch(image, det, cam_k, "Real",
                                           img_size=128, out_res=32,
                                           max_instances=8)
        assert batch["roi_img"].shape == (8, 128, 128, 3)
        assert batch["valid"].sum() == len(keep) == 1
        # the crop must contain the object mask
        assert batch["roi_mask"][0].sum() > 10

    def test_gt_as_predictions_perfect_map(self, synth_eval):
        """Feeding the GT sRT as predictions through the harness must give
        AP=1 everywhere — validates the fixture + harness conventions."""
        data_dir, _ = synth_eval
        reader = NocsEvalReader("Real", data_dir)
        results = []
        for i in range(len(reader)):
            _, det, _ = reader.read(i)
            det = dict(det)
            det["pred_RTs"] = np.array(det["gt_RTs"])
            det["pred_scales"] = np.array(det["gt_scales"])
            results.append(det)
        iou_aps, pose_aps = compute_degree_cm_map(results)
        present = sorted({int(c) for r in results
                          for c in r["gt_class_ids"]})
        for cid in present:
            assert iou_aps[cid, -1] == 1.0, (cid, iou_aps[cid])
            assert pose_aps[cid, 0, 0] == 1.0


class TestPerObjEmptyBatch:
    def test_other_class_only_images_give_finite_map(self, synth_eval,
                                                     tmp_path):
        """Regression: an image whose detections are all of OTHER classes
        must yield a consistent all-empty pred dict (length 0 for every
        pred_* key) and a finite mAP, not an IndexError in the matcher
        (reference keeps one coherent empty dict, evaluate.py:105-108)."""
        from givepose_tpu.eval.metrics import SYNSET_NAMES
        data_dir, _ = synth_eval
        reader = NocsEvalReader("Real", data_dir)
        per_img_cls = []
        for i in range(len(reader)):
            _, det, _ = reader.read(i)
            per_img_cls.append({int(c) for c in det["pred_class_ids"]})
        # pick a class present in >=1 image if possible (exercises mixed
        # empty/non-empty results); otherwise any class misses everywhere
        all_cls = set().union(*per_img_cls)
        target = next((c for c in all_cls
                       if any(c not in s for s in per_img_cls)),
                      next(c for c in range(1, 7) if c not in all_cls))
        assert any(target not in s for s in per_img_cls)

        cfg = Config(
            data=DataConfig(img_size=64, out_res=16,
                            per_obj=SYNSET_NAMES[target]),
            model=ModelConfig(compute_dtype="float32"),
            eval=EvalConfig(max_instances=4),
        )
        model = PoseNet(cfg=cfg.model, backbone_variant="tiny")
        scale_model = ScaleNet()
        image, det, cam_k = reader.read(0)
        batch, _ = build_instance_batch(
            image, det, cam_k, "Real", img_size=64, out_res=16,
            max_instances=4)
        import jax.numpy as jnp
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        variables = model.init(jax.random.PRNGKey(0), jb)
        sn_vars = scale_model.init(jax.random.PRNGKey(1), jb)

        results = run_inference(reader, model, variables, scale_model,
                                sn_vars, cfg)
        assert len(results) == 3
        empties = [r for r in results if len(r["pred_RTs"]) == 0]
        assert empties, "fixture must contain an other-class-only image"
        for r in empties:
            for key in ("pred_class_ids", "pred_scores", "pred_bboxes",
                        "pred_scales"):
                assert len(r[key]) == 0, key

        summary = evaluate_results(results, cfg, log=lambda *_: None)
        for v in summary["absolute"].values():
            assert np.isfinite(v)


class TestUmeyamaEvalPath:
    def test_depth_crop_and_gt_nocs_recover_pose(self, synth_eval):
        """GT NOCS crop + depth crop through the batched Umeyama fit must
        recover the GT similarity transform (validates the depth decode,
        the crop plumbing, and the absolute-pixel backprojection)."""
        import pickle
        import cv2
        import jax.numpy as jnp
        from givepose_tpu.eval.umeyama_pose import umeyama_pose_from_maps

        data_dir, _ = synth_eval
        reader = NocsEvalReader("Real", data_dir)
        image, det, cam_k = reader.read(0)
        depth = reader.read_depth(0)
        assert depth is not None and depth.dtype == np.uint16

        out_res = 64
        batch, keep = build_instance_batch(
            image, det, cam_k, "Real", img_size=128, out_res=out_res,
            max_instances=4, depth=depth)
        assert batch["roi_depth"].shape == (4, out_res, out_res)
        assert (batch["roi_depth"][0] > 0).sum() > 30

        # GT NOCS map cropped exactly like the driver crops coords
        sub = reader.img_list[0]
        img_path = f"{data_dir}/{sub}"
        enc = cv2.imread(img_path + "_coord.png")[:, :, ::-1]
        nocs = enc.astype(np.float32) / 255.0 - 0.5
        nocs[:, :, 2] = -nocs[:, :, 2]     # stored z-flipped
        center = batch["bbox_center"][0]
        scale = batch["img_scale"][0]
        a = out_res / scale
        m = np.array([[a, 0, out_res * 0.5 - a * center[0]],
                      [0, a, out_res * 0.5 - a * center[1]]], np.float32)
        nocs_crop = cv2.warpAffine(nocs, m, (out_res, out_res),
                                   flags=cv2.INTER_NEAREST)[None]

        im_h, im_w = image.shape[:2]
        cx2 = batch["roi_coord_2d"][:1]
        px = (cx2[..., 0] * (im_w - 1) + (im_w - 1)) * 0.5
        py = (cx2[..., 1] * (im_h - 1) + (im_h - 1)) * 0.5
        fit = umeyama_pose_from_maps(
            jnp.asarray(nocs_crop), jnp.asarray(px), jnp.asarray(py),
            jnp.asarray(batch["roi_depth"][:1]),
            jnp.asarray(batch["roi_mask_out"][:1]),
            jnp.asarray(batch["cam_K"][:1]),
            jax.random.PRNGKey(0))

        with open(img_path + "_label.pkl", "rb") as f:
            gts = pickle.load(f)
        gt_rot = gts["rotations"][0]
        gt_trans = gts["translations"][0]
        gt_scale = gts["scales"][0]
        assert abs(float(fit["scale"][0]) - gt_scale) < 0.05 * gt_scale
        np.testing.assert_allclose(np.asarray(fit["translation"][0]),
                                   gt_trans, atol=0.02)
        r_err = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(fit["rotation"][0]).T @ gt_rot) - 1) / 2,
            -1, 1)))
        assert r_err < 5.0, r_err

    def test_driver_use_umeyama_runs(self, synth_eval, tmp_path):
        """--use_umeyama end-to-end: driver produces finite mAP from
        Umeyama poses (random net -> garbage NOCS, but the path must
        execute and score)."""
        data_dir, _ = synth_eval
        cfg = Config(
            data=DataConfig(img_size=64, out_res=16, per_obj="all"),
            model=ModelConfig(compute_dtype="float32"),
            eval=EvalConfig(max_instances=4, use_umeyama=True),
        )
        model = PoseNet(cfg=cfg.model, backbone_variant="tiny")
        scale_model = ScaleNet()
        reader = NocsEvalReader("Real", data_dir)
        image, det, cam_k = reader.read(0)
        depth = reader.read_depth(0)
        batch, _ = build_instance_batch(
            image, det, cam_k, "Real", img_size=64, out_res=16,
            max_instances=4, depth=depth)
        import jax.numpy as jnp
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        variables = model.init(jax.random.PRNGKey(0), jb)
        sn_vars = scale_model.init(jax.random.PRNGKey(1), jb)

        results = run_inference(reader, model, variables, scale_model,
                                sn_vars, cfg)
        assert len(results) == 3
        assert results[0]["pred_RTs"].shape[1:] == (4, 4)
        summary = evaluate_results(results, cfg, log=lambda *_: None)
        for v in summary["absolute"].values():
            assert np.isfinite(v)


class TestEvalDriverSmoke:
    def test_random_model_runs_end_to_end(self, synth_eval, tmp_path):
        data_dir, _ = synth_eval
        cfg = Config(
            data=DataConfig(img_size=64, out_res=16, per_obj="all"),
            model=ModelConfig(compute_dtype="float32"),
            eval=EvalConfig(max_instances=4),
        )
        model = PoseNet(cfg=cfg.model, backbone_variant="tiny")
        scale_model = ScaleNet()

        reader = NocsEvalReader("Real", data_dir)
        image, det, cam_k = reader.read(0)
        batch, _ = build_instance_batch(
            image, det, cam_k, "Real", img_size=64, out_res=16,
            max_instances=4)
        import jax.numpy as jnp
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        variables = model.init(jax.random.PRNGKey(0), jb)
        sn_vars = scale_model.init(jax.random.PRNGKey(1), jb)

        cache = str(tmp_path / "pred_result.pkl")
        results = run_inference(reader, model, variables, scale_model,
                                sn_vars, cfg, cache_path=cache)
        assert len(results) == 3
        assert results[0]["pred_RTs"].shape[1:] == (4, 4)
        # sRT scale folded in: det of R-part is the cubed metric scale
        det_r = np.linalg.det(results[0]["pred_RTs"][0][:3, :3])
        assert det_r > 0

        logs = []
        summary = evaluate_results(results, cfg, log=logs.append)
        assert "absolute" in summary and "relative" in summary
        assert any("absolute mAP" in line for line in logs)

        # cache round trip
        results2 = run_inference(reader, model, variables, scale_model,
                                 sn_vars, cfg, cache_path=cache)
        np.testing.assert_allclose(results2[0]["pred_RTs"],
                                   results[0]["pred_RTs"])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
