"""Golden tests for the geometry layer.

Oracles are independent implementations (scipy.spatial.transform.Rotation,
direct numpy formulas), mirroring the reference's numerical semantics
(network/pose_utils/rot_reps.py, utils.py, pose_from_pred_centroid_z.py,
tools/align_utils.py) without reusing its code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from givepose_tpu import geometry as geo


def random_rotations(rng, n):
    return ScipyRot.random(n, random_state=np.random.RandomState(0)).as_matrix()


class TestRot6d:
    def test_round_trip(self, rng):
        R = random_rotations(rng, 32)
        d6 = geo.mat_to_rot6d(jnp.asarray(R))
        R2 = geo.rot6d_to_mat(d6)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_orthonormal_from_noise(self, rng):
        d6 = jnp.asarray(rng.normal(size=(64, 6)))
        R = np.asarray(geo.rot6d_to_mat(d6))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_gram_schmidt_semantics(self, rng):
        # column 0 must be normalize(a1); column 2 orth to both; matches
        # reference rot_reps.py:34-55 construction
        d6 = jnp.asarray(rng.normal(size=(8, 6)))
        R = np.asarray(geo.rot6d_to_mat(d6))
        a1 = np.asarray(d6[:, :3])
        x = a1 / np.linalg.norm(a1, axis=-1, keepdims=True)
        np.testing.assert_allclose(R[:, :, 0], x, atol=1e-5)

    def test_fixed_variants_orthonormal(self, rng):
        # NOTE: the reference's fixed-y/z constructions (rot_reps.py:57-91)
        # yield orthonormal but possibly improper (det=-1) frames; we
        # preserve that behavior, so only check |det| == 1.
        d6 = jnp.asarray(rng.normal(size=(16, 6)))
        for fn in (geo.rot6d_fixed_y_to_mat, geo.rot6d_fixed_z_to_mat,
                   geo.rot6d_fixed_x_to_mat):
            R = np.asarray(fn(d6))
            eye = np.einsum("bij,bkj->bik", R, R)
            np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)),
                                       atol=1e-5)
            np.testing.assert_allclose(np.abs(np.linalg.det(R)), 1.0,
                                       atol=1e-5)

    def test_fixed_y_anchors_y(self, rng):
        d6 = jnp.asarray(rng.normal(size=(8, 6)))
        R = np.asarray(geo.rot6d_fixed_y_to_mat(d6))
        a2 = np.asarray(d6[:, 3:])
        y = a2 / np.linalg.norm(a2, axis=-1, keepdims=True)
        np.testing.assert_allclose(R[:, :, 1], y, atol=1e-5)


class TestQuat:
    def test_quat_to_mat_vs_scipy(self, rng):
        q_wxyz = rng.normal(size=(32, 4))
        ours = np.asarray(geo.quat_to_mat(jnp.asarray(q_wxyz)))
        qn = q_wxyz / np.linalg.norm(q_wxyz, axis=-1, keepdims=True)
        ref = ScipyRot.from_quat(qn[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_mat_quat_round_trip(self, rng):
        R = random_rotations(rng, 64)
        q = geo.mat_to_quat(jnp.asarray(R))
        R2 = np.asarray(geo.quat_to_mat(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_quat_mul_vs_scipy(self, rng):
        q1 = rng.normal(size=(16, 4))
        q2 = rng.normal(size=(16, 4))
        q1 /= np.linalg.norm(q1, axis=-1, keepdims=True)
        q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
        ours = np.asarray(geo.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
        r = (ScipyRot.from_quat(q1[:, [1, 2, 3, 0]])
             * ScipyRot.from_quat(q2[:, [1, 2, 3, 0]]))
        ref_xyzw = r.as_quat()
        ref = ref_xyzw[:, [3, 0, 1, 2]]
        # quaternions are sign-ambiguous
        sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours * sign, ref, atol=1e-5)


class TestExtraReps:
    def test_lie_vec_vs_scipy(self, rng):
        vec = rng.normal(size=(16, 3)).astype(np.float64)
        ours = np.asarray(geo.lie_vec_to_mat(jnp.asarray(vec)))
        want = ScipyRot.from_rotvec(vec).as_matrix()
        np.testing.assert_allclose(ours, want, atol=1e-5)
        # zero vector -> identity (Taylor guard)
        z = np.asarray(geo.lie_vec_to_mat(jnp.zeros((1, 3))))
        np.testing.assert_allclose(z[0], np.eye(3), atol=1e-6)

    def test_log_quat_matches_quat_exp(self, rng):
        lq = rng.normal(size=(16, 4)).astype(np.float64) * 0.7
        ours = np.asarray(geo.log_quat_to_mat(jnp.asarray(lq)))
        # oracle: exp of a pure-imaginary part is an axis-angle rotation
        # by 2*|v| about v (unit-quat double cover)
        v = lq[:, 1:]
        want = ScipyRot.from_rotvec(
            2 * v / np.linalg.norm(v, axis=1, keepdims=True)
            * np.linalg.norm(v, axis=1, keepdims=True)).as_matrix()
        np.testing.assert_allclose(ours, want, atol=1e-5)

    def test_rot5d_ortho5d_vs_reference(self, rng):
        torch = pytest.importorskip("torch")
        from tests.ref_shim import import_reference

        reps = import_reference()("network.pose_utils.rot_reps")
        r5d = rng.normal(size=(16, 5)).astype(np.float64)
        ours = np.asarray(geo.rot5d_to_mat(jnp.asarray(r5d)))
        norm = reps.normalize_5d_rotation(torch.from_numpy(r5d))
        want = reps.rot5d_to_mat_batch(norm).numpy()
        np.testing.assert_allclose(ours, want, atol=1e-5)

        a = rng.normal(size=(16, 5)).astype(np.float32)
        ours = np.asarray(geo.ortho5d_to_mat(jnp.asarray(a)))
        want = reps.ortho5d_to_mat_batch(torch.from_numpy(a)).numpy()
        np.testing.assert_allclose(ours, want, atol=1e-4)

    def test_dispatch_new_types(self, rng):
        for t in ("ego_lie_vec", "allo_lie_vec"):
            m = np.asarray(geo.get_rot_mat(
                jnp.asarray(rng.normal(size=(4, 3))), t))
            np.testing.assert_allclose(m @ m.transpose(0, 2, 1),
                                       np.tile(np.eye(3), (4, 1, 1)),
                                       atol=1e-5)
        for t in ("ego_log_quat", "allo_log_quat"):
            m = np.asarray(geo.get_rot_mat(
                jnp.asarray(rng.normal(size=(4, 4))), t))
            np.testing.assert_allclose(np.linalg.det(m), np.ones(4),
                                       atol=1e-5)


class TestAxAngleEuler:
    def test_axangle_vs_scipy(self, rng):
        axis = rng.normal(size=(16, 3))
        angle = rng.uniform(0, np.pi, size=(16,))
        ours = np.asarray(geo.axangle_to_mat(jnp.asarray(axis),
                                             jnp.asarray(angle)))
        a = axis / np.linalg.norm(axis, axis=-1, keepdims=True)
        ref = ScipyRot.from_rotvec(a * angle[:, None]).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_euler_orthonormal(self, rng):
        e = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(16, 3)))
        R = np.asarray(geo.euler_to_mat(e))
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_euler_matches_reference_composition(self, rng):
        """Reference euler2mat_batch (rot_reps.py:365-383) is XZ'Y''
        intrinsic with channels (e0->X, e2->Z, e1->Y):
        R = Rx(e0) @ Rz(e2) @ Ry(e1)."""
        e = rng.uniform(-np.pi, np.pi, size=(16, 3))
        ours = np.asarray(geo.euler_to_mat(jnp.asarray(e)))
        ref = ScipyRot.from_euler(
            "XZY", np.stack([e[:, 0], e[:, 2], e[:, 1]], 1)).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestAlloEgo:
    def _ref_allo_to_ego(self, t, R_allo):
        """Independent numpy implementation of the reference's math
        (utils.py:29-84): rotate by the angle between cam ray and obj ray."""
        cam = np.array([0.0, 0.0, 1.0])
        obj = t / np.linalg.norm(t)
        angle = np.arccos(np.clip(cam @ obj, -1, 1))
        if angle < 1e-9:
            return R_allo
        axis = np.cross(cam, obj)
        axis = axis / np.linalg.norm(axis)
        corr = ScipyRot.from_rotvec(axis * angle).as_matrix()
        return corr @ R_allo

    def test_matches_numpy_reference(self, rng):
        R = random_rotations(rng, 16)
        t = rng.normal(size=(16, 3)) * 0.3 + np.array([0, 0, 2.0])
        ours = np.asarray(geo.allo_to_ego_mat(jnp.asarray(t), jnp.asarray(R)))
        # eps=1e-4 in the batched axis normalization (matching the
        # reference differentiable path, utils.py:198-229) perturbs the
        # correction by O(1e-3) vs the exact numpy path
        for i in range(16):
            ref = self._ref_allo_to_ego(t[i], R[i])
            np.testing.assert_allclose(ours[i], ref, atol=5e-3)

    def test_on_axis_identity(self):
        # object on the optical axis: allo == ego
        R = random_rotations(None, 4)
        t = np.tile(np.array([0.0, 0.0, 1.5]), (4, 1))
        ours = np.asarray(geo.allo_to_ego_mat(jnp.asarray(t), jnp.asarray(R)))
        np.testing.assert_allclose(ours, R, atol=1e-3)

    def test_round_trip(self, rng):
        R = random_rotations(rng, 8)
        t = rng.normal(size=(8, 3)) * 0.3 + np.array([0, 0, 2.0])
        ego = geo.allo_to_ego_mat(jnp.asarray(t), jnp.asarray(R))
        back = np.asarray(geo.ego_to_allo_mat(jnp.asarray(t), ego))
        np.testing.assert_allclose(back, R, atol=1e-3)

    def test_quat_path_matches_mat_path(self, rng):
        R = random_rotations(rng, 8)
        t = rng.normal(size=(8, 3)) * 0.3 + np.array([0, 0, 2.0])
        q = geo.mat_to_quat(jnp.asarray(R))
        ego_q = geo.quat_to_mat(geo.allo_to_ego_quat(jnp.asarray(t), q))
        ego_m = geo.allo_to_ego_mat(jnp.asarray(t), jnp.asarray(R))
        np.testing.assert_allclose(np.asarray(ego_q), np.asarray(ego_m),
                                   atol=1e-3)


class TestPoseAssembly:
    def test_backprojection_consistency(self, rng):
        """Assembled translation must project back to the input centroid."""
        b = 8
        K = np.tile(np.array([[591.0, 0, 322.5], [0, 590.2, 244.1],
                              [0, 0, 1]], np.float32), (b, 1, 1))
        R = random_rotations(rng, b).astype(np.float32)
        centroids = rng.uniform(-0.2, 0.2, size=(b, 2)).astype(np.float32)
        z_vals = rng.uniform(0.5, 2.0, size=(b, 1)).astype(np.float32)
        centers = rng.uniform(100, 400, size=(b, 2)).astype(np.float32)
        ratios = rng.uniform(0.2, 0.6, size=(b,)).astype(np.float32)
        whs = rng.uniform(50, 200, size=(b, 2)).astype(np.float32)

        rot, trans = geo.pose_from_pred_centroid_z(
            jnp.asarray(R), jnp.asarray(centroids), jnp.asarray(z_vals),
            jnp.asarray(K), jnp.asarray(centers), jnp.asarray(ratios),
            jnp.asarray(whs), is_allo=True, z_type="REL")
        rot, trans = np.asarray(rot), np.asarray(trans)
        # z unnormalization: z = z_pred * resize_ratio (reference :207-211)
        np.testing.assert_allclose(trans[:, 2], z_vals[:, 0] * ratios,
                                   rtol=1e-5)
        # projecting t through K recovers the absolute centroid (:226-233)
        proj = np.einsum("bij,bj->bi", K, trans)
        proj = proj[:, :2] / proj[:, 2:3]
        expect = centroids * whs + centers
        np.testing.assert_allclose(proj, expect, rtol=1e-3, atol=1e-2)
        # rotations remain orthonormal after allo->ego
        eye = np.einsum("bij,bkj->bik", rot, rot)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (b, 1, 1)),
                                   atol=1e-4)

    def test_is_differentiable(self, rng):
        b = 4
        K = jnp.tile(jnp.array([[577.5, 0, 319.5], [0, 577.5, 239.5],
                                [0, 0, 1]], jnp.float32), (b, 1, 1))

        def loss(z):
            rot, trans = geo.pose_from_pred_centroid_z(
                jnp.tile(jnp.eye(3, dtype=jnp.float32), (b, 1, 1)),
                jnp.zeros((b, 2), jnp.float32), z, K,
                jnp.full((b, 2), 320.0, jnp.float32),
                jnp.full((b,), 0.25, jnp.float32),
                jnp.full((b, 2), 100.0, jnp.float32))
            return jnp.sum(trans ** 2) + jnp.sum(rot ** 2)

        g = jax.grad(loss)(jnp.ones((b, 1), jnp.float32))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSymmetry:
    def test_bank_shape_and_identity(self):
        bank = geo.symmetry_rotation_bank_y(30)
        assert bank.shape == (30, 3, 3)
        np.testing.assert_allclose(bank[0], np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(bank), 1.0, atol=1e-12)

    def test_closest_sym_rot_recovers_offset(self, rng):
        """gt rotated by a bank element must map back to ~zero error."""
        bank = jnp.asarray(geo.symmetry_rotation_bank_y(36), jnp.float32)
        R_gt = jnp.asarray(random_rotations(rng, 8), jnp.float32)
        # prediction = gt composed with the 7th bank rotation
        R_pred = R_gt @ bank[7]
        sym = jnp.ones((8,))
        closest = geo.closest_sym_rot(R_pred, R_gt, sym, bank)
        err = np.asarray(geo.rotation_error_deg(R_pred, closest))
        # arccos near trace==3 is ill-conditioned in f32: ~0.05 deg floor
        assert np.all(err < 0.2)

    def test_non_sym_passthrough(self, rng):
        bank = jnp.asarray(geo.symmetry_rotation_bank_y(36), jnp.float32)
        R_gt = jnp.asarray(random_rotations(rng, 8), jnp.float32)
        R_pred = jnp.asarray(random_rotations(rng, 8), jnp.float32)
        closest = geo.closest_sym_rot(R_pred, R_gt, jnp.zeros((8,)), bank)
        np.testing.assert_allclose(np.asarray(closest), np.asarray(R_gt),
                                   atol=1e-6)

    def test_matches_bruteforce_argmin(self, rng):
        bank_np = geo.symmetry_rotation_bank_y(30).astype(np.float32)
        R_gt = random_rotations(rng, 6).astype(np.float32)
        R_pred = random_rotations(rng, 6).astype(np.float32)
        ours = np.asarray(geo.closest_sym_rot(
            jnp.asarray(R_pred), jnp.asarray(R_gt), jnp.ones((6,)),
            jnp.asarray(bank_np)))
        for i in range(6):
            best_err, best_R = np.inf, None
            for k in range(30):
                cand = R_gt[i] @ bank_np[k]
                tr = np.trace(R_pred[i] @ cand.T)
                err = np.arccos(np.clip(0.5 * (min(tr, 3.0) - 1), -1, 1))
                if err < best_err:
                    best_err, best_R = err, cand
            np.testing.assert_allclose(ours[i], best_R, atol=1e-5)


class TestErrors:
    def test_rotation_error(self, rng):
        R = random_rotations(rng, 8)
        np.testing.assert_allclose(
            np.asarray(geo.rotation_error_deg(jnp.asarray(R), jnp.asarray(R))),
            0.0, atol=1e-2)
        Ry90 = ScipyRot.from_euler("y", 90, degrees=True).as_matrix()
        err = geo.rotation_error_deg(jnp.asarray(R @ Ry90), jnp.asarray(R))
        np.testing.assert_allclose(np.asarray(err), 90.0, atol=1e-3)


class TestUmeyama:
    def _synthetic(self, rng, n=256, noise=0.0, outliers=0):
        src = rng.uniform(-0.5, 0.5, size=(n, 3))
        s = 0.37
        R = ScipyRot.from_euler("xyz", rng.uniform(-1, 1, 3)).as_matrix()
        t = np.array([0.1, -0.2, 1.4])
        tgt = s * src @ R.T + t + noise * rng.normal(size=(n, 3))
        if outliers:
            idx = rng.choice(n, size=outliers, replace=False)
            tgt[idx] += rng.normal(size=(outliers, 3)) * 0.5
        return src, tgt, s, R, t

    def test_exact_recovery(self, rng):
        src, tgt, s, R, t = self._synthetic(rng)
        scale, rot, trans = geo.umeyama_similarity(jnp.asarray(src),
                                                   jnp.asarray(tgt))
        np.testing.assert_allclose(float(scale), s, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(rot), R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(trans), t, atol=1e-5)

    def test_batched(self, rng):
        srcs, tgts = [], []
        params = []
        for _ in range(4):
            src, tgt, s, R, t = self._synthetic(rng)
            srcs.append(src); tgts.append(tgt); params.append((s, R, t))
        scale, rot, trans = geo.umeyama_similarity(
            jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(tgts)))
        for i, (s, R, t) in enumerate(params):
            np.testing.assert_allclose(float(scale[i]), s, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(rot[i]), R, atol=1e-4)

    def test_reflection_fix(self, rng):
        # a degenerate planar set can produce det<0 without the sign fix
        src = rng.uniform(-0.5, 0.5, size=(64, 3))
        src[:, 2] = 0
        R = ScipyRot.from_euler("z", 0.3).as_matrix()
        tgt = src @ R.T
        _, rot, _ = geo.umeyama_similarity(jnp.asarray(src), jnp.asarray(tgt))
        assert float(jnp.linalg.det(rot)) > 0

    def test_ransac_with_outliers(self, rng):
        src, tgt, s, R, t = self._synthetic(rng, n=256, noise=1e-4,
                                            outliers=60)
        out = geo.ransac_umeyama(jnp.asarray(src), jnp.asarray(tgt),
                                 key=jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(out["scale"]), s, rtol=1e-2)
        err = geo.rotation_error_deg(out["rotation"], jnp.asarray(R))
        assert float(err) < 1.0
        np.testing.assert_allclose(np.asarray(out["translation"]), t,
                                   atol=5e-3)

    def test_ransac_jits(self, rng):
        src, tgt, *_ = self._synthetic(rng, n=128)
        fn = jax.jit(geo.ransac_umeyama)
        out = fn(jnp.asarray(src), jnp.asarray(tgt))
        assert np.isfinite(float(out["scale"]))

    def test_backproject(self):
        K = jnp.array([[500.0, 0, 64], [0, 500.0, 64], [0, 0, 1]])
        depth = jnp.ones((128, 128)) * 2.0
        mask = jnp.ones((128, 128))
        pts, valid = geo.backproject_depth(depth, K, mask)
        assert pts.shape == (128 * 128, 3)
        np.testing.assert_allclose(np.asarray(pts[:, 2]), 2.0)
        # center pixel maps to x=y=0
        center = np.asarray(pts.reshape(128, 128, 3)[64, 64])
        np.testing.assert_allclose(center[:2], 0.0, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestBopErrors:
    def test_mssd_zero_for_equal_and_sym(self, rng):
        from givepose_tpu.geometry.bop_errors import mssd, mspd
        pts = rng.uniform(-0.1, 0.1, (200, 3))
        R = ScipyRot.from_euler("xyz", [0.2, 0.1, -0.3]).as_matrix()
        t = np.array([0.0, 0.0, 1.0])
        eye = np.eye(3)[None]
        assert mssd(R, t, R, t, pts, eye) < 1e-12
        # symmetric object: est rotated by a sym transform scores 0
        ry = ScipyRot.from_euler("y", 90, degrees=True).as_matrix()
        syms = np.stack([np.eye(3), ry])
        assert mssd(R @ ry, t, R, t, pts, syms) < 1e-6
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        assert mspd(R, t, R, t, K, pts, eye) < 1e-8

    def test_mssd_positive_for_offset(self, rng):
        from givepose_tpu.geometry.bop_errors import mssd
        pts = rng.uniform(-0.1, 0.1, (100, 3))
        R = np.eye(3)
        t = np.array([0, 0, 1.0])
        err = mssd(R, t + [0.05, 0, 0], R, t, pts, np.eye(3)[None])
        np.testing.assert_allclose(err, 0.05, rtol=1e-6)

    def test_vsd_identical_poses_zero(self, rng):
        from givepose_tpu.geometry.bop_errors import vsd
        pts = rng.uniform(-0.08, 0.08, (3000, 3)).astype(np.float32)
        R = np.eye(3, dtype=np.float32)
        t = np.array([0, 0, 1.0], np.float32)
        K = np.array([[500.0, 0, 64], [0, 500.0, 64], [0, 0, 1]],
                     np.float32)
        depth_test = np.zeros((128, 128), np.float32)
        errs = vsd(R, t, R, t, K, pts, depth_test, im_h=128, im_w=128,
                   taus=(0.02,))
        assert errs[0] < 1e-6
        # grossly wrong pose -> error near 1
        errs2 = vsd(R, t + [0.5, 0.5, 0], R, t, K, pts, depth_test,
                    im_h=128, im_w=128, taus=(0.02,))
        assert errs2[0] > 0.9

    def test_mssd_sym_translation(self, rng):
        """BOP symmetry transforms carry translations: t_gt_sym =
        R_gt @ t_s + t_gt (pose_error.py:146-148).  An est pose equal to
        the gt pose composed with (S, t_s) must score zero."""
        from givepose_tpu.geometry.bop_errors import mssd, mspd
        pts = rng.uniform(-0.1, 0.1, (150, 3))
        R = ScipyRot.from_euler("xyz", [0.4, -0.2, 0.1]).as_matrix()
        t = np.array([0.05, -0.02, 1.0])
        S = ScipyRot.from_euler("z", 180, degrees=True).as_matrix()
        ts = np.array([0.0, 0.0, 0.03])
        R_est = R @ S
        t_est = R @ ts + t
        syms = np.stack([np.eye(3), S])
        sym_ts = np.stack([np.zeros(3), ts])
        assert mssd(R_est, t_est, R, t, pts, syms, sym_ts) < 1e-12
        # without the translation the same est pose scores > 0
        assert mssd(R_est, t_est, R, t, pts, syms) > 0.01
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        assert mspd(R_est, t_est, R, t, K, pts, syms, sym_ts) < 1e-8

    def test_vsd_uses_distance_images(self):
        """VSD compares ray distances, not raw z (BOP
        misc.depth_im_to_dist_im_fast): at an off-center pixel the ray
        factor sqrt(((x-cx)/fx)^2+((y-cy)/fy)^2+1) scales z."""
        from givepose_tpu.geometry.bop_errors import _depth_to_dist
        K = np.array([[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]])
        depth = np.zeros((16, 16))
        depth[0, 0] = 2.0
        dist = _depth_to_dist(depth, K)
        factor = np.sqrt((8 / 100) ** 2 + (8 / 100) ** 2 + 1.0)
        np.testing.assert_allclose(dist[0, 0], 2.0 * factor, rtol=1e-12)
        assert dist[5, 5] == 0.0
