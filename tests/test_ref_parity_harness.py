"""Differential test: our vectorized mAP harness vs the ACTUAL reference
``evaluation/eval_utils_cass.py:compute_degree_cm_mAP`` running unmodified
(via tests/ref_shim.py) on randomized canned result dicts."""

import numpy as np
import pytest

from givepose_tpu.eval.harness import compute_degree_cm_map
from givepose_tpu.eval.metrics import SYNSET_NAMES

from tests.ref_shim import import_reference


@pytest.fixture(scope="module")
def ref_harness():
    ref = import_reference()
    return ref("evaluation.eval_utils_cass").compute_degree_cm_mAP


def _rand_rot(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def _rand_srt(rng, n):
    rts = np.zeros((n, 4, 4))
    for i in range(n):
        s = rng.uniform(0.1, 0.5)
        rts[i, :3, :3] = _rand_rot(rng) * s
        rts[i, :3, 3] = rng.uniform(-0.3, 0.3, 3) + [0, 0, 1.0]
        rts[i, 3, 3] = 1.0
    return rts


def _canned_results(rng, n_images=8, max_inst=5, perturb=0.1):
    """Random per-image result dicts; predictions are noisy copies of a GT
    subset plus false positives, so matches exercise every code path."""
    results = []
    for _ in range(n_images):
        n_gt = int(rng.integers(0, max_inst + 1))
        gt_cls = rng.integers(1, 7, size=n_gt)
        gt_rts = _rand_srt(rng, n_gt)
        gt_scales = rng.uniform(0.3, 1.0, size=(n_gt, 3))
        gt_hv = rng.integers(0, 2, size=n_gt)

        # predictions: each GT kept with p=0.7 (perturbed), plus 0-2 FPs
        keep = rng.random(n_gt) < 0.7
        n_fp = int(rng.integers(0, 3))
        pred_cls = np.concatenate(
            [gt_cls[keep], rng.integers(1, 7, size=n_fp)])
        pred_rts = np.concatenate(
            [gt_rts[keep], _rand_srt(rng, n_fp)]) if len(pred_cls) else \
            np.zeros((0, 4, 4))
        for i in range(int(keep.sum())):
            ang = rng.normal(0, perturb)
            c, s = np.cos(ang), np.sin(ang)
            dr = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            pred_rts[i, :3, :3] = pred_rts[i, :3, :3] @ dr
            pred_rts[i, :3, 3] += rng.normal(0, perturb * 0.3, 3)
        pred_scales = np.concatenate(
            [gt_scales[keep] * rng.uniform(0.9, 1.1, (int(keep.sum()), 1)),
             rng.uniform(0.3, 1.0, size=(n_fp, 3))]) if len(pred_cls) \
            else np.zeros((0, 3))
        pred_scores = rng.uniform(0.3, 1.0, size=len(pred_cls))

        results.append({
            "gt_class_ids": gt_cls.astype(np.int32),
            "gt_RTs": gt_rts,
            "gt_scales": gt_scales,
            "gt_handle_visibility": gt_hv,
            "pred_class_ids": pred_cls.astype(np.int32),
            "pred_RTs": pred_rts,
            "pred_scales": pred_scales,
            "pred_scores": pred_scores,
            # non-zero boxes: the reference trim_zeros asserts none vanish
            "pred_bboxes": rng.uniform(1, 100, size=(len(pred_cls), 4)),
            "gt_bboxes": rng.uniform(1, 100, size=(n_gt, 4)),
        })
    return results


DEGREE_THRS = [5, 10, 360]
SHIFT_THRS = [5, 10, 1e4]
IOU_THRS = [0.1, 0.25, 0.5, 0.75]


class TestHarnessDifferential:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_reference_ap_arrays(self, ref_harness, tmp_path, seed):
        rng = np.random.default_rng(seed)
        results = _canned_results(rng)

        iou_ref, pose_ref = ref_harness(
            results, SYNSET_NAMES, str(tmp_path),
            degree_thresholds=DEGREE_THRS, shift_thresholds=SHIFT_THRS,
            iou_3d_thresholds=IOU_THRS, iou_pose_thres=0.1,
            use_matches_for_pose=True)
        iou_ours, pose_ours = compute_degree_cm_map(
            results, SYNSET_NAMES, DEGREE_THRS, SHIFT_THRS, IOU_THRS,
            iou_pose_thres=0.1, use_matches_for_pose=True)

        np.testing.assert_allclose(iou_ours, iou_ref, atol=1e-6)
        np.testing.assert_allclose(pose_ours, pose_ref, atol=1e-6)
        # the fixture must have produced non-trivial APs
        assert iou_ref[1:-1].sum() > 0

    def test_matches_reference_without_iou_match_gate(self, ref_harness,
                                                      tmp_path):
        rng = np.random.default_rng(3)
        results = _canned_results(rng, n_images=6)
        iou_ref, pose_ref = ref_harness(
            results, SYNSET_NAMES, str(tmp_path),
            degree_thresholds=DEGREE_THRS, shift_thresholds=SHIFT_THRS,
            iou_3d_thresholds=IOU_THRS, iou_pose_thres=0.1,
            use_matches_for_pose=False)
        iou_ours, pose_ours = compute_degree_cm_map(
            results, SYNSET_NAMES, DEGREE_THRS, SHIFT_THRS, IOU_THRS,
            iou_pose_thres=0.1, use_matches_for_pose=False)
        np.testing.assert_allclose(iou_ours, iou_ref, atol=1e-6)
        np.testing.assert_allclose(pose_ours, pose_ref, atol=1e-6)

    def test_near_perfect_predictions(self, ref_harness, tmp_path):
        """Tiny (1e-3 rad) perturbation rather than bit-identical poses:
        the reference's unclipped arccos (eval_utils_cass.py:169) returns
        NaN when trace(R1 R2^T) rounds above 3, silently failing EXACT
        matches at every threshold.  We clip (correct behavior), so parity
        is only claimed away from that singular point."""
        rng = np.random.default_rng(4)
        results = _canned_results(rng, n_images=4, perturb=1e-3)
        for r in results:
            n = len(r["gt_class_ids"])
            r["pred_class_ids"] = r["gt_class_ids"].copy()
            rts = r["gt_RTs"].copy()
            for i in range(n):
                ang = 1e-3
                c, s = np.cos(ang), np.sin(ang)
                rts[i, :3, :3] = rts[i, :3, :3] @ np.array(
                    [[c, -s, 0], [s, c, 0], [0, 0, 1]])
            r["pred_RTs"] = rts
            r["pred_scales"] = r["gt_scales"].copy()
            r["pred_scores"] = np.ones(n)
            r["pred_bboxes"] = np.full((n, 4), 5.0)
        iou_ref, pose_ref = ref_harness(
            results, SYNSET_NAMES, str(tmp_path),
            degree_thresholds=DEGREE_THRS, shift_thresholds=SHIFT_THRS,
            iou_3d_thresholds=IOU_THRS, iou_pose_thres=0.1,
            use_matches_for_pose=True)
        iou_ours, pose_ours = compute_degree_cm_map(
            results, SYNSET_NAMES, DEGREE_THRS, SHIFT_THRS, IOU_THRS,
            iou_pose_thres=0.1, use_matches_for_pose=True)
        np.testing.assert_allclose(iou_ours, iou_ref, atol=1e-6)
        np.testing.assert_allclose(pose_ours, pose_ref, atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
