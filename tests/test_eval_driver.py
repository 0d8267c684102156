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
