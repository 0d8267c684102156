"""Differential test: our PoseLossFn vs the ACTUAL reference
``losses/pose_loss.py:PoseLoss`` running unmodified (CPU torch, via
tests/ref_shim.py) on identical random inputs."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from givepose_tpu.core.config import LossConfig
from givepose_tpu.losses.pose_loss import PoseLossFn

from tests.ref_shim import import_reference

OUT_RES = 64  # reference FLAGS.out_res default; its loss reshapes use it


@pytest.fixture(scope="module")
def ref_pose_loss():
    ref = import_reference()
    return ref("losses.pose_loss").PoseLoss()


def _rand_rot(rng, n):
    rots = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        rots.append(q)
    return np.stack(rots).astype(np.float32)


def _make_inputs(rng, bs=4, n_pts=64):
    """(pred, data) in our NHWC layout; sym for samples 0,1."""
    sym_info = np.zeros((bs, 4), np.float32)
    sym_info[0, 0] = 1
    sym_info[1, 0] = 1
    mask = (rng.random((bs, OUT_RES, OUT_RES, 1)) < 0.3).astype(np.float32)
    mask_sp = (rng.random((bs, OUT_RES, OUT_RES, 1)) < 0.3
               ).astype(np.float32)
    pred = {
        "rot": _rand_rot(rng, bs),
        "trans": rng.normal(size=(bs, 3)).astype(np.float32),
        "size": rng.normal(size=(bs, 3)).astype(np.float32),
        "nocs_coor": rng.normal(
            size=(bs, OUT_RES, OUT_RES, 3)).astype(np.float32) * 0.3,
        "ivfc_coor": rng.normal(
            size=(bs, OUT_RES, OUT_RES, 3)).astype(np.float32) * 0.3,
    }
    data = {
        "rotation": _rand_rot(rng, bs),
        "translation": rng.normal(size=(bs, 3)).astype(np.float32),
        "real_size": rng.uniform(0.05, 0.3, (bs, 3)).astype(np.float32),
        "nocs_scale": rng.uniform(0.1, 0.4, (bs,)).astype(np.float32),
        "sym_info": sym_info,
        "roi_mask_output": mask,
        "roi_ivfc_mask_output": mask_sp,
        "nocs_coord": rng.uniform(
            -0.5, 0.5, (bs, OUT_RES, OUT_RES, 3)).astype(np.float32),
        "ivfc_coord": rng.uniform(
            -0.5, 0.5, (bs, OUT_RES, OUT_RES, 3)).astype(np.float32),
        "model_point": rng.uniform(
            -0.5, 0.5, (bs, n_pts, 3)).astype(np.float32),
    }
    return pred, data


def _to_torch_ref(pred, data):
    """Convert the NHWC pytrees to the reference's NCHW torch dicts."""
    t = lambda a: torch.from_numpy(np.asarray(a))
    nchw = lambda a: t(a).permute(0, 3, 1, 2).contiguous()
    pred_t = {
        "rot": t(pred["rot"]),
        "trans": t(pred["trans"]),
        "size": t(pred["size"]),
        "nocs_coor": nchw(pred["nocs_coor"]),
        "ivfc_coor": nchw(pred["ivfc_coor"]),
    }
    data_t = {
        "rotation": t(data["rotation"]),
        "translation": t(data["translation"]),
        "real_size": t(data["real_size"]),
        "nocs_scale": t(data["nocs_scale"]),
        "sym_info": t(data["sym_info"]),
        "roi_mask_output": nchw(data["roi_mask_output"]),
        "roi_ivfc_mask_output": nchw(data["roi_ivfc_mask_output"]),
        "nocs_coord": nchw(data["nocs_coord"]),
        "ivfc_coord": nchw(data["ivfc_coord"]),
        "model_point": t(data["model_point"]),
    }
    return pred_t, data_t


class TestLossDifferential:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_loss_dict_matches_reference(self, ref_pose_loss, seed):
        rng = np.random.default_rng(seed)
        pred, data = _make_inputs(rng)
        pred_t, data_t = _to_torch_ref(pred, data)

        with torch.no_grad():
            ref_losses = ref_pose_loss(pred_t, data_t)

        ours = PoseLossFn(LossConfig())(
            {k: jnp.asarray(v) for k, v in pred.items()},
            {k: jnp.asarray(v) for k, v in data.items()})

        assert set(ours) == set(ref_losses)
        for key in ref_losses:
            ref_val = float(ref_losses[key])
            our_val = float(ours[key])
            assert ref_val == pytest.approx(our_val, abs=2e-5), \
                (key, ref_val, our_val)

    def test_no_sym_samples(self, ref_pose_loss):
        """All-asymmetric batch skips the whole sym-resolution branch."""
        rng = np.random.default_rng(7)
        pred, data = _make_inputs(rng)
        data["sym_info"] = np.zeros((4, 4), np.float32)
        pred_t, data_t = _to_torch_ref(pred, data)
        with torch.no_grad():
            ref_losses = ref_pose_loss(pred_t, data_t)
        ours = PoseLossFn(LossConfig())(
            {k: jnp.asarray(v) for k, v in pred.items()},
            {k: jnp.asarray(v) for k, v in data.items()})
        for key in ref_losses:
            assert float(ref_losses[key]) == pytest.approx(
                float(ours[key]), abs=2e-5), key


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
