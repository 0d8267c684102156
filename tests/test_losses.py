"""PoseLoss unit tests against constructed cases and brute-force oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from givepose_tpu.core.config import LossConfig
from givepose_tpu.losses import PoseLossFn, pnp_loss, scale_loss
from givepose_tpu.geometry import symmetry_rotation_bank_y


def make_data(rng, b=4, res=8, p=16, sym_first=True):
    rots = ScipyRot.random(b, random_state=np.random.RandomState(0)
                           ).as_matrix().astype(np.float32)
    sym = np.zeros((b, 4), np.float32)
    if sym_first:
        sym[0, 0] = 1.0
    return {
        "rotation": jnp.asarray(rots),
        "translation": jnp.asarray(rng.normal(size=(b, 3)) * 0.1
                                   + [0, 0, 1], jnp.float32),
        "real_size": jnp.asarray(rng.uniform(0.05, 0.3, (b, 3)),
                                 jnp.float32),
        "nocs_scale": jnp.asarray(rng.uniform(0.1, 0.4, (b,)),
                                  jnp.float32),
        "sym_info": jnp.asarray(sym),
        "nocs_coord": jnp.asarray(rng.uniform(-0.5, 0.5, (b, res, res, 3)),
                                  jnp.float32),
        "ivfc_coord": jnp.asarray(rng.uniform(-0.5, 0.5, (b, res, res, 3)),
                                  jnp.float32),
        "roi_mask_output": jnp.ones((b, res, res, 1), jnp.float32),
        "roi_ivfc_mask_output": jnp.ones((b, res, res, 1), jnp.float32),
        "model_point": jnp.asarray(rng.uniform(-0.5, 0.5, (b, p, 3)),
                                   jnp.float32),
    }


def perfect_pred(data):
    return {
        "rot": data["rotation"],
        "trans": data["translation"] / data["nocs_scale"][:, None],
        "size": data["real_size"] / data["nocs_scale"][:, None],
        "nocs_coor": data["nocs_coord"],
        "ivfc_coor": data["ivfc_coord"],
    }


class TestPoseLoss:
    def test_perfect_prediction_zero_loss(self, rng):
        data = make_data(rng, sym_first=False)
        loss_fn = PoseLossFn(LossConfig())
        losses = loss_fn(perfect_pred(data), data)
        for k, v in losses.items():
            assert float(v) < 1e-5, (k, float(v))

    def test_sym_sample_rotation_forgiven(self, rng):
        """A y-rotation on a symmetric sample must not be penalized in
        Rot1 (the closest-sym-gt absorbs it), while the same rotation on a
        non-symmetric sample is."""
        data = make_data(rng, sym_first=True)
        pred = perfect_pred(data)
        ry = jnp.asarray(ScipyRot.from_euler("y", 40, degrees=True
                                             ).as_matrix(), jnp.float32)
        rot = pred["rot"].at[0].set(pred["rot"][0] @ ry)
        pred_sym = dict(pred, rot=rot)
        loss_fn = PoseLossFn(LossConfig())
        l_sym = loss_fn(pred_sym, data)
        # 360-bank resolution: residual < 1 degree
        assert float(l_sym["Rot1"]) < 5e-3, float(l_sym["Rot1"])

        data_nosym = make_data(rng, sym_first=False)
        pred2 = perfect_pred(data_nosym)
        rot2 = pred2["rot"].at[0].set(pred2["rot"][0] @ ry)
        l_nosym = loss_fn(dict(pred2, rot=rot2), data_nosym)
        assert float(l_nosym["Rot1"]) > 0.05

    def test_coor_loss_huber_regions(self, rng):
        """Dense coordinate loss: quadratic below 0.03, linear above
        (reference pose_loss.py:188-196)."""
        data = make_data(rng, b=1, sym_first=False)
        pred = perfect_pred(data)
        cfg = LossConfig(coor_w=1.0)
        loss_fn = PoseLossFn(cfg)
        # small perturbation: quadratic -> loss = d^2/(2*0.03)
        d_small = 0.01
        p1 = dict(pred, nocs_coor=pred["nocs_coor"] + d_small)
        l1 = float(loss_fn(p1, data)["nocs_coor"])
        np.testing.assert_allclose(l1, 3 * d_small ** 2 / 0.06, rtol=1e-3)
        # large: linear -> d - 0.015 per channel
        d_big = 0.2
        p2 = dict(pred, nocs_coor=pred["nocs_coor"] + d_big)
        l2 = float(loss_fn(p2, data)["nocs_coor"])
        np.testing.assert_allclose(l2, 3 * (d_big - 0.015), rtol=1e-3)

    def test_mask_normalization(self, rng):
        """Zero-mask pixels must not contribute; loss normalizes by mask
        area."""
        data = make_data(rng, b=1, sym_first=False)
        mask = np.zeros((1, 8, 8, 1), np.float32)
        mask[0, :4] = 1.0
        data = dict(data, roi_mask_output=jnp.asarray(mask))
        pred = perfect_pred(data)
        # corrupt only masked-out pixels: loss stays ~0
        bad = np.asarray(pred["nocs_coor"]).copy()
        bad[0, 4:] += 10.0
        l = PoseLossFn(LossConfig())(dict(pred, nocs_coor=jnp.asarray(bad)),
                                     data)
        assert float(l["nocs_coor"]) < 1e-6

    def test_weights_scale_terms(self, rng):
        data = make_data(rng, sym_first=False)
        pred = perfect_pred(data)
        pred = dict(pred, trans=pred["trans"] + 0.1)
        l1 = PoseLossFn(LossConfig(tran_w=1.0))(pred, data)
        l2 = PoseLossFn(LossConfig(tran_w=2.0))(pred, data)
        np.testing.assert_allclose(2 * float(l1["Tran"]),
                                   float(l2["Tran"]), rtol=1e-6)

    def test_angle_loss_variant(self, rng):
        data = make_data(rng, sym_first=False)
        pred = perfect_pred(data)
        loss_fn = PoseLossFn(LossConfig(r_loss="angle"))
        l = loss_fn(pred, data)
        assert float(l["Rot1"]) < 1e-4

    def test_smoothl1_variant(self, rng):
        data = make_data(rng, sym_first=False)
        pred = perfect_pred(data)
        loss_fn = PoseLossFn(LossConfig(pose_loss_type="smoothl1"))
        losses = loss_fn(pred, data)
        assert all(float(v) < 1e-6 for v in losses.values())

    def test_grad_flows(self, rng):
        data = make_data(rng, sym_first=True)
        loss_fn = PoseLossFn(LossConfig())

        def total(rot):
            pred = perfect_pred(data)
            return sum(loss_fn(dict(pred, rot=rot), data).values())

        g = jax.grad(total)(perfect_pred(data)["rot"])
        assert np.isfinite(np.asarray(g)).all()


class TestOtherLosses:
    def test_pnp_loss_perfect(self, rng):
        data = make_data(rng, sym_first=True)
        pred = perfect_pred(data)
        bank = jnp.asarray(symmetry_rotation_bank_y(360), jnp.float32)
        l = pnp_loss(LossConfig(), pred, data, bank)
        assert set(l) == {"Rot1", "Tran", "Point_matching"}
        assert all(float(v) < 1e-5 for v in l.values())

    def test_scale_loss(self):
        cfg = LossConfig()
        l = scale_loss(cfg, jnp.asarray([1.0, 2.0]), jnp.asarray([1.5, 2.0]))
        np.testing.assert_allclose(float(l), 0.25)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestAuxLosses:
    def test_soft_label_ce(self):
        from givepose_tpu.losses import soft_label_cross_entropy
        logits = jnp.asarray([[2.0, 1.0, 0.0]])
        target = jnp.asarray([[1.0, 0.0, 0.5]])
        v = float(soft_label_cross_entropy(logits, target))
        # target zeros replaced by 1 -> log 1 = 0 contribution
        p = np.exp([2, 1, 0]) / np.exp([2, 1, 0]).sum()
        expect = -(np.log(1.0) * p[0] + np.log(1.0) * p[1]
                   + np.log(0.5) * p[2])
        np.testing.assert_allclose(v, expect, rtol=1e-5)

    def test_aleatoric_losses_finite(self, rng):
        from givepose_tpu.losses import (laplacian_aleatoric_loss,
                                         gaussian_aleatoric_loss)
        pred = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        tgt = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        logv = jnp.zeros((4, 1), jnp.float32)
        assert np.isfinite(float(laplacian_aleatoric_loss(pred, tgt, logv)))
        assert np.isfinite(float(gaussian_aleatoric_loss(pred, tgt,
                                                         jnp.zeros((4, 3)))))

    def test_backbone_mask_loss(self, rng):
        from givepose_tpu.losses import backbone_mask_loss
        gt = jnp.asarray((rng.uniform(size=(2, 8, 8, 1)) > 0.5),
                         jnp.float32)
        # perfect logits -> low loss; inverted -> high
        good = (gt * 2 - 1) * 20.0
        assert float(backbone_mask_loss(good, gt)) < 1e-6
        assert float(backbone_mask_loss(-good, gt)) > 5.0
