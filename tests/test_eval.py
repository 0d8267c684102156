"""Evaluation harness tests with exactly constructed cases."""

import math

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from givepose_tpu.eval.harness import (
    compute_degree_cm_map,
    scale_normalize_results,
    summarize,
)
from givepose_tpu.eval.metrics import (
    pairwise_3d_iou,
    pairwise_degree_cm,
    voc_ap,
)


def make_rt(rot=None, trans=(0, 0, 1.0), scale=1.0):
    rt = np.eye(4)
    rt[:3, :3] = (np.eye(3) if rot is None else rot) * scale
    rt[:3, 3] = trans
    return rt


def result(gt_cls, gt_rts, gt_scales, pr_cls, pr_rts, pr_scales,
           scores=None, hv=None):
    return {
        "gt_class_ids": np.asarray(gt_cls),
        "gt_RTs": np.asarray(gt_rts),
        "gt_scales": np.asarray(gt_scales),
        "gt_handle_visibility": (np.ones(len(gt_cls)) if hv is None
                                 else np.asarray(hv)),
        "pred_class_ids": np.asarray(pr_cls),
        "pred_scores": (np.ones(len(pr_cls)) if scores is None
                        else np.asarray(scores)),
        "pred_RTs": np.asarray(pr_rts),
        "pred_scales": np.asarray(pr_scales),
        # non-zero boxes: an all-zero pred_bboxes row is PADDING by the
        # reference convention and is trimmed before matching
        "pred_bboxes": np.ones((len(pr_cls), 4)),
    }


class TestPairwiseIoU:
    def test_identical_boxes(self):
        rts = np.array([make_rt()])
        sc = np.array([[0.1, 0.2, 0.1]])
        iou = pairwise_3d_iou(rts, sc, rts, sc, [3], [3], [1])
        np.testing.assert_allclose(iou, 1.0, atol=1e-9)

    def test_disjoint_boxes(self):
        a = np.array([make_rt(trans=(0, 0, 1))])
        b = np.array([make_rt(trans=(5, 0, 1))])
        sc = np.array([[0.1, 0.1, 0.1]])
        iou = pairwise_3d_iou(a, sc, b, sc, [3], [3], [1])
        np.testing.assert_allclose(iou, 0.0)

    def test_matches_bruteforce(self, rng):
        """Independent brute force: AABB of transformed corners."""
        p, g = 3, 4
        pr = np.array([make_rt(ScipyRot.random(
            random_state=np.random.RandomState(i)).as_matrix(),
            trans=rng.uniform(-0.1, 0.1, 3) + [0, 0, 1])
            for i in range(p)])
        gt = np.array([make_rt(ScipyRot.random(
            random_state=np.random.RandomState(10 + i)).as_matrix(),
            trans=rng.uniform(-0.1, 0.1, 3) + [0, 0, 1])
            for i in range(g)])
        psc = rng.uniform(0.05, 0.3, (p, 3))
        gsc = rng.uniform(0.05, 0.3, (g, 3))
        iou = pairwise_3d_iou(pr, psc, gt, gsc, [3] * p, [3] * g,
                              np.ones(g))

        def brute(rt1, s1, rt2, s2):
            def aabb(rt, s):
                corners = np.array([[x, y, z] for x in (-s[0]/2, s[0]/2)
                                    for y in (-s[1]/2, s[1]/2)
                                    for z in (-s[2]/2, s[2]/2)])
                tc = corners @ rt[:3, :3].T + rt[:3, 3]
                return tc.min(0), tc.max(0)
            mn1, mx1 = aabb(rt1, s1)
            mn2, mx2 = aabb(rt2, s2)
            omin, omax = np.maximum(mn1, mn2), np.minimum(mx1, mx2)
            if (omax - omin).min() < 0:
                inter = 0.0
            else:
                inter = np.prod(omax - omin)
            u = np.prod(mx1 - mn1) + np.prod(mx2 - mn2) - inter
            return inter / u

        for i in range(p):
            for j in range(g):
                np.testing.assert_allclose(
                    iou[i, j], brute(pr[i], psc[i], gt[j], gsc[j]),
                    rtol=1e-9)

    def test_symmetry_rotation_max(self):
        """A bottle rotated about y must still have IoU ~1 via the
        20-rotation max (reference :74-93)."""
        ry = ScipyRot.from_euler("y", 2 * math.pi / 20 * 3).as_matrix()
        pred = np.array([make_rt(ry)])
        gt = np.array([make_rt()])
        sc = np.array([[0.08, 0.2, 0.08]])
        iou_sym = pairwise_3d_iou(pred, sc, gt, sc, [1], [1],
                                  np.ones(1))  # bottle
        assert iou_sym[0, 0] > 0.99
        iou_cam = pairwise_3d_iou(pred, sc, gt, sc, [3], [3],
                                  np.ones(1))  # camera (non-sym)
        assert iou_cam[0, 0] < iou_sym[0, 0]


class TestPairwiseDegreeCm:
    def test_exact(self):
        R = ScipyRot.from_euler("x", 0.3).as_matrix()
        rts = np.array([make_rt(R)])
        err = pairwise_degree_cm(rts, rts, [3], np.ones(1))
        np.testing.assert_allclose(err[0, 0, 0], 0.0, atol=1e-4)
        np.testing.assert_allclose(err[0, 0, 1], 0.0, atol=1e-9)

    def test_known_angle_and_shift(self):
        R = ScipyRot.from_euler("z", 30, degrees=True).as_matrix()
        pred = np.array([make_rt(R, trans=(0.05, 0, 1))])
        gt = np.array([make_rt(trans=(0, 0, 1))])
        err = pairwise_degree_cm(pred, gt, [3], np.ones(1))
        np.testing.assert_allclose(err[0, 0, 0], 30.0, atol=1e-5)
        np.testing.assert_allclose(err[0, 0, 1], 5.0, atol=1e-9)

    def test_y_symmetry_ignores_y_rotation(self):
        ry = ScipyRot.from_euler("y", 77, degrees=True).as_matrix()
        pred = np.array([make_rt(ry)])
        gt = np.array([make_rt()])
        # can (class 4): symmetric
        err = pairwise_degree_cm(pred, gt, [4], np.ones(1))
        np.testing.assert_allclose(err[0, 0, 0], 0.0, atol=1e-5)
        # camera (class 3): not
        err2 = pairwise_degree_cm(pred, gt, [3], np.ones(1))
        np.testing.assert_allclose(err2[0, 0, 0], 77.0, atol=1e-4)

    def test_scaled_rt_normalized(self):
        """sRT convention: scale folded into RT must not affect angles."""
        R = ScipyRot.from_euler("x", 25, degrees=True).as_matrix()
        pred = np.array([make_rt(R, scale=0.37)])
        gt = np.array([make_rt(scale=1.4)])
        err = pairwise_degree_cm(pred, gt, [3], np.ones(1))
        np.testing.assert_allclose(err[0, 0, 0], 25.0, atol=1e-4)


class TestVocAp:
    def test_perfect(self):
        ap = voc_ap(np.array([0, 1, 2]), np.array([0.9, 0.8, 0.7]),
                    np.array([0, 1, 2]))
        assert ap == 1.0

    def test_one_false_positive_high_score(self):
        # FP at the highest score hurts precision at low recall
        ap = voc_ap(np.array([-1, 0, 1]), np.array([0.9, 0.8, 0.7]),
                    np.array([1, 2]))
        assert 0.4 < ap < 1.0

    def test_missed_gt(self):
        ap = voc_ap(np.array([0]), np.array([0.9]), np.array([0, -1]))
        np.testing.assert_allclose(ap, 0.5)


class TestHarness:
    def test_perfect_predictions_full_ap(self, rng):
        results = []
        for i in range(3):
            R = ScipyRot.random(
                random_state=np.random.RandomState(i)).as_matrix()
            rt = make_rt(R, trans=rng.uniform(-0.2, 0.2, 3) + [0, 0, 1])
            sc = rng.uniform(0.05, 0.3, (1, 3))
            results.append(result([3], [rt], sc, [3], [rt], sc))
        iou_aps, pose_aps = compute_degree_cm_map(results)
        # class-3 AP (the mean over classes averages in empty classes,
        # matching the reference's layout)
        assert iou_aps[3, -1] == 1.0           # IoU75
        assert pose_aps[3, 0, 0] == 1.0        # 5 deg 5 cm

    def test_wrong_rotation_fails_tight_pose(self, rng):
        R_off = ScipyRot.from_euler("x", 20, degrees=True).as_matrix()
        rt_gt = make_rt(trans=(0, 0, 1))
        rt_pred = make_rt(R_off, trans=(0, 0, 1))
        sc = np.array([[0.2, 0.2, 0.2]])
        res = [result([3], [rt_gt], sc, [3], [rt_pred], sc)]
        iou_aps, pose_aps = compute_degree_cm_map(res)
        # 5 and 10 deg fail, 360 deg passes
        assert pose_aps[3, 0, 0] == 0.0
        assert pose_aps[3, 1, 0] == 0.0
        assert pose_aps[3, 2, 0] == 1.0

    def test_summary_keys(self, rng):
        rt = make_rt(trans=(0, 0, 1))
        sc = np.array([[0.2, 0.2, 0.2]])
        res = [result([3], [rt], sc, [3], [rt], sc)]
        iou_aps, pose_aps = compute_degree_cm_map(res)
        summary = summarize(iou_aps, pose_aps, (5, 10, 360),
                            (5, 10, 1e4), (0.1, 0.25, 0.5, 0.75),
                            cls_idx=3)
        assert summary["IoU75"] == 100.0
        assert summary["5d5cm"] == 100.0
        assert summary["10d"] == 100.0

    def test_scale_normalization(self):
        rt = make_rt(scale=2.0, trans=(0, 0, 1))
        res = [result([3], [rt], np.ones((1, 3)), [3], [rt],
                      np.ones((1, 3)))]
        normed = scale_normalize_results(res)
        det = np.linalg.det(normed[0]["gt_RTs"][0][:3, :3])
        np.testing.assert_allclose(det, 1.0, rtol=1e-9)
        # translation also divided (reference :218: rows /= scale)
        np.testing.assert_allclose(normed[0]["gt_RTs"][0][:3, 3],
                                   [0, 0, 0.5])

    def test_empty_images_skipped(self):
        res = [result([], np.zeros((0, 4, 4)), np.zeros((0, 3)), [],
                      np.zeros((0, 4, 4)), np.zeros((0, 3)))]
        iou_aps, pose_aps = compute_degree_cm_map(res)
        assert np.all(iou_aps == 0)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestUmeyamaPose:
    def test_recovers_known_pose_batched(self, rng):
        """Synthetic NOCS+depth maps -> the vmapped RANSAC fit must
        recover the GT similarity per instance."""
        import jax
        import jax.numpy as jnp
        from givepose_tpu.eval.umeyama_pose import umeyama_pose_from_maps

        b, r = 2, 32
        K = np.tile(np.array([[591.0, 0, 322.5], [0, 590.2, 244.1],
                              [0, 0, 1]], np.float32), (b, 1, 1))
        nocs = rng.uniform(-0.4, 0.4, (b, r, r, 3)).astype(np.float32)
        mask = (rng.uniform(size=(b, r, r)) > 0.2).astype(np.float32)
        scales = np.array([0.2, 0.35], np.float32)
        rots = ScipyRot.random(b, random_state=np.random.RandomState(3)
                               ).as_matrix().astype(np.float32)
        trans = np.array([[0.1, -0.05, 1.2], [0.0, 0.1, 0.9]], np.float32)

        # camera-space points and their projections define depth + pixels
        cam = (np.einsum("bij,bhwj->bhwi", rots,
                         nocs * scales[:, None, None, None])
               + trans[:, None, None, :])
        depth = cam[..., 2] * mask
        px = cam[..., 0] / cam[..., 2] * K[:, None, None, 0, 0] \
            + K[:, None, None, 0, 2]
        py = cam[..., 1] / cam[..., 2] * K[:, None, None, 1, 1] \
            + K[:, None, None, 1, 2]

        out = umeyama_pose_from_maps(
            jnp.asarray(nocs), jnp.asarray(px), jnp.asarray(py),
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(K),
            jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out["scale"]), scales,
                                   rtol=1e-2)
        for i in range(b):
            from givepose_tpu.geometry import rotation_error_deg
            err = float(rotation_error_deg(out["rotation"][i],
                                           jnp.asarray(rots[i])))
            assert err < 1.0, err
        np.testing.assert_allclose(np.asarray(out["translation"]), trans,
                                   atol=5e-3)


class TestRansacPnP:
    def test_recovers_pose(self, rng):
        """cv2 PnP from exact NOCS<->pixel correspondences."""
        from givepose_tpu.eval.pnp import ransac_pnp
        r = 32
        K = np.array([[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1]])
        nocs = rng.uniform(-0.4, 0.4, (r, r, 3)).astype(np.float32)
        mask = np.ones((r, r), np.float32)
        R = ScipyRot.from_euler("xyz", [0.2, -0.4, 0.1]).as_matrix()
        t = np.array([0.1, -0.05, 1.1])
        scale = 0.25
        cam = (nocs * scale) @ R.T + t
        px = cam[..., 0] / cam[..., 2] * K[0, 0] + K[0, 2]
        py = cam[..., 1] / cam[..., 2] * K[1, 1] + K[1, 2]
        fit = ransac_pnp(nocs, px, py, mask, K, nocs_scale=scale)
        assert fit is not None
        rot, trans = fit
        from givepose_tpu.geometry import rotation_error_deg
        import jax.numpy as jnp
        err = float(rotation_error_deg(jnp.asarray(rot),
                                       jnp.asarray(R, jnp.float32)))
        assert err < 0.5
        np.testing.assert_allclose(trans, t, atol=5e-3)

    def test_too_few_points(self):
        from givepose_tpu.eval.pnp import ransac_pnp
        K = np.eye(3)
        out = ransac_pnp(np.zeros((4, 4, 3)), np.zeros((4, 4)),
                         np.zeros((4, 4)), np.zeros((4, 4)), K)
        assert out is None


class TestZeroPaddingTrim:
    def test_padded_rows_are_trimmed_like_reference(self, rng):
        """Zero-padded detection rows (all-zero pred_bboxes) must be
        dropped before matching (reference eval_utils_cass.py:277-279),
        so a padded result scores identically to its trimmed version."""
        R = ScipyRot.random(
            random_state=np.random.RandomState(3)).as_matrix()
        rt = make_rt(R, trans=[0.1, 0.0, 1.0])
        sc = rng.uniform(0.05, 0.3, (1, 3))
        clean = result([3], [rt], sc, [3], [rt], sc)

        padded = result([3], [rt], sc, [3, 3, 3],
                        np.stack([rt, np.eye(4), np.eye(4)]),
                        np.vstack([sc, np.zeros((2, 3))]),
                        scores=[1.0, 0.9, 0.8])
        padded["pred_bboxes"] = np.vstack([np.ones((1, 4)),
                                           np.zeros((2, 4))])

        iou_a, pose_a = compute_degree_cm_map([clean])
        iou_b, pose_b = compute_degree_cm_map([padded])
        np.testing.assert_allclose(np.asarray(iou_b), np.asarray(iou_a))
        np.testing.assert_allclose(np.asarray(pose_b),
                                   np.asarray(pose_a))
