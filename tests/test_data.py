"""Data pipeline tests on a synthetic NOCS-format dataset."""

import os
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from givepose_tpu.data import (
    NocsRecordReader,
    TrainPipeline,
    collate_records,
    preprocess_batch,
    EpochSampler,
)
from givepose_tpu.data.augment import color_augment, defor_2d_mask
from givepose_tpu.data.synthetic import make_synthetic_nocs


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    data_dir, ivfc_dir = make_synthetic_nocs(str(root), n_images=4)
    return data_dir, ivfc_dir


class TestReader:
    def test_reads_records(self, synth):
        data_dir, ivfc_dir = synth
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        assert len(reader) == 4
        rec = reader.read(0, random.Random(0))
        assert rec is not None
        assert rec.image.shape == (480, 640, 3)
        assert rec.mask.sum() > 50
        assert rec.nocs_coord.shape == (480, 640, 3)
        # nocs zeroed outside the mask
        assert np.all(rec.nocs_coord[rec.mask == 0] == 0)
        assert np.abs(rec.nocs_coord).max() <= 0.5 + 1e-3
        assert rec.ivfc_mask.sum() > 0

    def test_nocs_decode_consistent_with_pose(self, synth):
        """Round-trip: R @ (nocs*scale... ) + t must project onto pixels.

        The synthetic writer encodes exact NOCS/pose pairs, so decode +
        projection must land each NOCS pixel near its own image location —
        this catches channel-order / z-flip mistakes in the decoder.
        """
        data_dir, ivfc_dir = synth
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        rec = reader.read(1, random.Random(0))
        ys, xs = np.where(rec.mask > 0)
        take = slice(0, len(ys), max(1, len(ys) // 200))
        nocs = rec.nocs_coord[ys[take], xs[take]]       # [-0.5, 0.5]
        # metric points: nocs * nocs_scale (model normalized by diagonal)
        pts = nocs * rec.nocs_scale
        cam = pts @ rec.rotation.T + rec.translation
        proj = cam @ rec.cam_k.T
        px = proj[:, 0] / proj[:, 2]
        py = proj[:, 1] / proj[:, 2]
        err = np.hypot(px - xs[take], py - ys[take])
        # decode quantizes to 1/255 in NOCS -> a few pixels after proj
        assert np.median(err) < 4.0, np.median(err)

    def test_zero_instance_label_returns_none(self, synth, tmp_path):
        """A label pkl that unpickles fine but holds zero instances must
        take the bad-sample-skip path (None), not raise out of the
        prefetch worker."""
        import pickle
        import shutil

        data_dir, ivfc_dir = synth
        clone = str(tmp_path / "NOCS")
        shutil.copytree(data_dir, clone)
        reader = NocsRecordReader("Real", "train", clone, ivfc_dir)
        img_path = os.path.join(clone, reader.img_list[0])
        with open(img_path + "_label.pkl", "rb") as f:
            gts = pickle.load(f)
        empty = {k: (np.asarray(v)[:0] if isinstance(v, (list, np.ndarray))
                     else v) for k, v in gts.items()}
        with open(img_path + "_label.pkl", "wb") as f:
            pickle.dump(empty, f)
        assert reader.read(0, random.Random(0)) is None
        # a model name missing from obj_models also skips, not KeyError
        reader2 = NocsRecordReader("Real", "train", clone, ivfc_dir)
        reader2.models = {}
        assert reader2.read(1, random.Random(0)) is None

    def test_bad_index_skipping(self, synth):
        data_dir, ivfc_dir = synth
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        reader.img_list.append("Real/train/scene_1/9999")  # nonexistent
        assert reader.read(len(reader) - 1) is None


class TestPreprocess:
    def test_shapes_and_ranges(self, synth):
        data_dir, ivfc_dir = synth
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        recs = [reader.read(i, random.Random(i)) for i in range(3)]
        batch = collate_records(recs)
        out = preprocess_batch(jax.random.PRNGKey(0), batch,
                               img_size=128, out_res=32, train=True)
        assert out["roi_img"].shape == (3, 128, 128, 3)
        assert out["nocs_coord"].shape == (3, 32, 32, 3)
        assert out["roi_coord_2d"].shape == (3, 32, 32, 2)
        assert out["roi_mask_output"].shape == (3, 32, 32, 1)
        assert out["full_img"].shape == (3, 128, 128, 3)
        assert np.isfinite(np.asarray(out["roi_img"])).all()
        # mask binary
        m = np.asarray(out["roi_mask_output"])
        assert set(np.unique(m)).issubset({0.0, 1.0})
        # crop covers the object: some foreground present
        assert m.sum() > 0
        # resize_ratio = out_res / scale
        np.testing.assert_allclose(
            np.asarray(out["resize_ratio"]),
            32.0 / np.asarray(out["img_scale"]), rtol=1e-6)

    def test_eval_mode_deterministic(self, synth):
        data_dir, ivfc_dir = synth
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        recs = [reader.read(0, random.Random(0))]
        batch = collate_records(recs)
        a = preprocess_batch(jax.random.PRNGKey(0), batch, img_size=128,
                             out_res=32, train=False)
        b = preprocess_batch(jax.random.PRNGKey(7), batch, img_size=128,
                             out_res=32, train=False)
        np.testing.assert_allclose(np.asarray(a["roi_img"]),
                                   np.asarray(b["roi_img"]))
        # eval centers on the exact bbox
        bb = batch["bbox"][0]
        np.testing.assert_allclose(
            np.asarray(a["bbox_center"][0]),
            [(bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2], rtol=1e-5)

    def test_coord2d_matches_warped_grid(self, synth):
        """Closed-form coord crop == warping the analytic grid."""
        import cv2
        from givepose_tpu.ops import get_2d_coord_grid
        data_dir, ivfc_dir = synth
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        rec = reader.read(0, random.Random(0))
        batch = collate_records([rec])
        out = preprocess_batch(jax.random.PRNGKey(0), batch, img_size=128,
                               out_res=32, train=False)
        got = np.asarray(out["roi_coord_2d"][0])          # (32,32,2)
        center = np.asarray(out["bbox_center"][0])
        scale = float(out["img_scale"][0])
        grid = np.asarray(get_2d_coord_grid(640, 480)).transpose(1, 2, 0)
        a = 32 / scale
        m = np.array([[a, 0, 16 - a * center[0]],
                      [0, a, 16 - a * center[1]]], np.float32)
        ref = cv2.warpAffine(grid, m, (32, 32), flags=cv2.INTER_NEAREST)
        assert np.abs(got - ref).max() < 2.0 / 480  # tie-break tolerance


    def test_coord2d_zero_border_matches_cv2(self):
        """A crop extending past the image must zero the out-of-image
        coord cells exactly like the reference's cv2.warpAffine
        BORDER_CONSTANT 0 (load_data_nocs.py:285-287) — not extrapolate
        the grid (pad 1.5x puts border objects in this regime)."""
        import cv2
        from givepose_tpu.data.preprocess import crop_coord_2d
        from givepose_tpu.ops import get_2d_coord_grid
        from givepose_tpu.ops.resample import crop_coord_2d_np

        im_w, im_h, out = 64, 48, 16
        center, scale = (4.0, 44.0), 40.0     # hangs off two edges
        grid = np.asarray(get_2d_coord_grid(im_w, im_h)
                          ).transpose(1, 2, 0)
        a = out / scale
        m = np.array([[a, 0, out / 2 - a * center[0]],
                      [0, a, out / 2 - a * center[1]]], np.float32)
        ref = cv2.warpAffine(grid, m, (out, out),
                             flags=cv2.INTER_NEAREST)
        got_np = crop_coord_2d_np(center, scale, out, im_w, im_h)
        got_dev = np.asarray(crop_coord_2d(
            jnp.asarray([center], jnp.float32),
            jnp.asarray([scale], jnp.float32), out, im_w, im_h))[0]
        assert (ref == 0).all(axis=-1).sum() > 10  # border cells exist
        assert np.abs(got_np - ref).max() < 2.0 / 48
        assert np.abs(got_dev - ref).max() < 2.0 / 48
        # the zeroed cells are exactly zero in both
        zero = (ref == 0).all(axis=-1)
        assert (got_np[zero] == 0).all()
        assert (got_dev[zero] == 0).all()


class TestAugment:
    def test_color_augment_bounds(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
        out = color_augment(jax.random.PRNGKey(0), img, prob=1.0)
        o = np.asarray(out)
        assert o.min() >= 0 and o.max() <= 255
        assert not np.allclose(o, np.asarray(img))

    def test_color_augment_prob_zero_identity(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, (2, 16, 16, 3)), jnp.float32)
        out = color_augment(jax.random.PRNGKey(0), img, prob=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-4)

    def test_color_augment_order_is_per_sample(self, rng):
        """The op ORDER must vary across samples within one batch
        (reference imgaug random_order=True is per image).  brightness
        and contrast do not commute, so with prob=1 two samples given
        identical pixels diverge iff their orders differ."""
        one = rng.uniform(0, 255, (1, 16, 16, 3))
        img = jnp.asarray(np.tile(one, (64, 1, 1, 1)), jnp.float32)
        out = np.asarray(color_augment(jax.random.PRNGKey(3), img,
                                       prob=1.0))
        # factors are per-sample too, so outputs differ regardless; the
        # order effect is isolated by recomputing with per-batch order:
        # instead check the internal order tensor directly
        keys = jax.random.split(jax.random.PRNGKey(3), 10)
        order = np.asarray(jnp.argsort(
            jax.random.uniform(keys[9], (64, 4)), axis=1))
        assert len({tuple(r) for r in order}) > 1
        assert not np.allclose(out[0], out[1])

    def test_mask_deform_band_only(self, rng):
        mask = np.zeros((1, 32, 32), np.float32)
        mask[0, 8:24, 8:24] = 1.0
        out = np.asarray(defor_2d_mask(jax.random.PRNGKey(1),
                                       jnp.asarray(mask), prob=1.0))
        # interior far from the boundary untouched
        np.testing.assert_allclose(out[0, 12:20, 12:20], 1.0)
        np.testing.assert_allclose(out[0, :6, :6], 0.0)
        assert set(np.unique(out)).issubset({0.0, 1.0})


class TestSampler:
    def test_ratio(self):
        # sizes where the reference's n_repeat formula
        # ((train_size)//(4*real_len) + 1) evaluates to 1, giving the
        # intended 3:1 page composition (engine/train.py:99-105 semantics)
        s = EpochSampler(camera_len=900, real_len=100, train_size=380,
                         syn_ratio=3.0, seed=0)
        idx = s.epoch_indices()
        assert len(idx) == 380
        n_real = int((idx >= 900).sum())
        n_cam = int((idx < 900).sum())
        # CAMERA:Real ~ 3:1
        assert 2.0 < n_cam / max(n_real, 1) < 4.5

    def test_ratio_preserved_when_camera_small(self):
        """Real-heavy regime: syn_ratio*real_len > camera_len.  The
        reference's random.sample would raise; we keep the requested
        CAMERA:Real ratio via repeated permutation passes."""
        s = EpochSampler(camera_len=50, real_len=100, train_size=300,
                         syn_ratio=3.0, seed=0)
        s._refill(300)
        pool = np.asarray(s._pool)
        n_cam = int((pool < 50).sum())
        n_real = int((pool >= 50).sum())
        # page composition: 3*n_repeat*real_len CAMERA + real_len Real
        assert (n_cam, n_real) == (300, 100)
        # permutation passes: every CAMERA id drawn exactly 6 times
        counts = np.bincount(pool[pool < 50], minlength=50)
        np.testing.assert_array_equal(counts, 6)

    def test_process_local_indices_partition(self):
        from givepose_tpu.core.mesh import process_local_indices
        indices = np.arange(64)
        parts = [process_local_indices(indices, 16, process_id=p,
                                       num_processes=4)
                 for p in range(4)]
        # every global batch must be the concat of the process chunks
        for t in range(4):
            got = np.concatenate([p[t * 4:(t + 1) * 4] for p in parts])
            np.testing.assert_array_equal(got, indices[t * 16:(t + 1) * 16])

    def test_pipeline_epoch(self, synth):
        data_dir, ivfc_dir = synth
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        pipe = TrainPipeline(reader, batch_size=2, train_size=4)
        batches = list(pipe.epoch())
        assert len(batches) == 2
        assert batches[0]["image"].shape == (2, 480, 640, 3)

    def test_abandoned_epoch_generator_releases_worker(self, synth):
        """next(iter(epoch())) (the CLI's init-template probe) abandons
        the generator; the prefetch worker must exit instead of blocking
        on the bounded queue forever, pinning host batches."""
        import threading

        data_dir, ivfc_dir = synth
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        pipe = TrainPipeline(reader, batch_size=2, train_size=4)
        before = set(threading.enumerate())
        next(iter(pipe.epoch()))     # generator GC'd right here
        import time
        deadline = time.time() + 10
        while time.time() < deadline:
            extra = [t for t in set(threading.enumerate()) - before
                     if t.is_alive()]
            if not extra:
                break
            time.sleep(0.1)
        assert not extra, f"leaked worker threads: {extra}"

    def test_pipeline_propagates_worker_errors(self, synth):
        """A failure in the prefetch thread must raise in the consumer,
        not deadlock it on q.get() (the Python-3.12 tuple-seed TypeError
        hung the whole CLI e2e suite this way)."""
        data_dir, ivfc_dir = synth
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        pipe = TrainPipeline(reader, batch_size=2, train_size=4)
        boom = RuntimeError("worker boom")

        def bad_read(indices, rng):
            raise boom

        pipe._read_batch = bad_read
        with pytest.raises(RuntimeError, match="worker boom"):
            list(pipe.epoch())


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestAugment3D:
    def _setup(self, rng, b=3, n=64):
        from scipy.spatial.transform import Rotation as SR
        rots = SR.random(b, random_state=np.random.RandomState(2)
                         ).as_matrix().astype(np.float32)
        data = {
            "rotation": jnp.asarray(rots),
            "translation": jnp.asarray(
                rng.normal(size=(b, 3)) * 0.1 + [0, 0, 1], jnp.float32),
            "real_size": jnp.asarray(rng.uniform(0.08, 0.3, (b, 3)),
                                     jnp.float32),
            "model_point": jnp.asarray(rng.uniform(-0.4, 0.4, (b, n, 3)),
                                       jnp.float32),
            "sym_info": jnp.asarray(np.tile([[0, 1, 0, 0]], (b, 1)),
                                    jnp.float32),
            "aug_bb": jnp.asarray(rng.uniform(0.8, 1.2, (b, 3)),
                                  jnp.float32),
            "aug_rt_t": jnp.asarray(rng.normal(size=(b, 3)) * 0.02,
                                    jnp.float32),
            "aug_rt_R": jnp.asarray(np.tile(np.eye(3), (b, 1, 1)),
                                    jnp.float32),
            "cat_id0": jnp.asarray([1, 2, 5]),
            "nocs_scale": jnp.asarray(rng.uniform(0.1, 0.4, (b,)),
                                      jnp.float32),
        }
        nocs = jnp.asarray(rng.uniform(-0.4, 0.4, (b, n, 3)), jnp.float32)
        pc = (jnp.einsum("bij,bnj->bni", data["rotation"],
                         nocs * data["nocs_scale"][:, None, None])
              + data["translation"][:, None, :])
        return pc, nocs, data

    def test_bb_aug_preserves_pose_consistency(self, rng):
        """After bb rescale, pc must equal R @ (nocs * new_scale) + t."""
        from givepose_tpu.data.augment3d import defor_3d_bb
        pc, nocs, d = self._setup(rng)
        pc2, size2, nocs2, model2 = defor_3d_bb(
            pc, d["rotation"], d["translation"], d["real_size"], nocs,
            d["model_point"], d["sym_info"], d["aug_bb"])
        # the nocs_scale after augmentation is norm(new_size)/norm(size)
        # times the old scale; consistency: points re-projected from the
        # augmented nocs with that scale match pc2
        old_scale = np.asarray(d["nocs_scale"])
        ratio = (np.linalg.norm(np.asarray(size2), axis=1)
                 / np.linalg.norm(np.asarray(d["real_size"]), axis=1))
        new_scale = old_scale * ratio
        recon = (np.einsum("bij,bnj->bni", np.asarray(d["rotation"]),
                           np.asarray(nocs2) * new_scale[:, None, None])
                 + np.asarray(d["translation"])[:, None, :])
        np.testing.assert_allclose(recon, np.asarray(pc2), atol=1e-5)

    def test_rt_aug_moves_pose(self, rng):
        from givepose_tpu.data.augment3d import defor_3d_rt
        pc, nocs, d = self._setup(rng)
        pc2, rot2, t2 = defor_3d_rt(pc, d["rotation"], d["translation"],
                                    d["aug_rt_t"], d["aug_rt_R"])
        np.testing.assert_allclose(np.asarray(t2),
                                   np.asarray(d["translation"])
                                   + np.asarray(d["aug_rt_t"]), atol=1e-6)
        # with identity aug_R, object-frame points unchanged
        obj1 = np.einsum("bij,bnj->bni",
                         np.asarray(d["rotation"]).transpose(0, 2, 1),
                         np.asarray(pc)
                         - np.asarray(d["translation"])[:, None])
        obj2 = np.einsum("bij,bnj->bni",
                         np.asarray(rot2).transpose(0, 2, 1),
                         np.asarray(pc2) - np.asarray(t2)[:, None])
        np.testing.assert_allclose(obj1, obj2, atol=1e-5)

    def test_pc_augment_driver(self, rng):
        from givepose_tpu.data.augment3d import pc_augment
        pc, nocs, d = self._setup(rng)
        pc2, nocs2, d2 = pc_augment(jax.random.PRNGKey(0), pc, nocs, d)
        assert pc2.shape == pc.shape
        assert np.isfinite(np.asarray(pc2)).all()
        assert set(d2) == set(d)


class TestBboxUtils:
    def test_square_window_quantized(self):
        from givepose_tpu.data.bbox_utils import get_bbox_square
        rmin, rmax, cmin, cmax = get_bbox_square((100, 100, 150, 160))
        assert rmax - rmin == cmax - cmin == 80   # 60 -> 80 quantum
        assert rmin >= 0 and cmax <= 640

    def test_clamped_at_border(self):
        from givepose_tpu.data.bbox_utils import get_bbox_square
        rmin, rmax, cmin, cmax = get_bbox_square((0, 0, 30, 30))
        assert rmin == 0 and cmin == 0
        assert rmax - rmin == 40

    def test_real_hw_clips(self):
        from givepose_tpu.data.bbox_utils import get_real_hw
        w, h = get_real_hw((-10, -20, 100, 200))
        assert (w, h) == (200, 100)
