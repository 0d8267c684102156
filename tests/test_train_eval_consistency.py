"""Train-path vs eval-path input consistency.

The pose/scale nets are trained on `data/preprocess.py` outputs and
served on `eval/build_instance_batch` outputs.  Any convention drift
between the two (crop scale, roi_wh units, one-hot layout, mean_size
table, full-image resize) silently degrades real eval — exactly the
failure mode of the reference's implicit coupling between
datasets/load_data_nocs.py and evaluation/load_data_eval.py.  This test
pins them together on the synthetic fixture with augmentation off.
"""

import random

import numpy as np
import jax
import pytest

from givepose_tpu.data import (
    NocsRecordReader,
    collate_records,
    preprocess_batch,
)
from givepose_tpu.data.synthetic import make_synthetic_eval
from givepose_tpu.eval import NocsEvalReader, build_instance_batch

IMG_SIZE, OUT_RES = 64, 16


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("consistency")
    # test split carries BOTH the training labels and GT detections
    data_dir, ivfc_dir = make_synthetic_eval(str(root), n_images=2, seed=3)
    return data_dir, ivfc_dir


def test_scale_net_inputs_match(fixture):
    data_dir, ivfc_dir = fixture
    train_reader = NocsRecordReader("Real", "test", data_dir, ivfc_dir)
    eval_reader = NocsEvalReader("Real", data_dir)
    assert len(train_reader) and len(eval_reader)

    rec = train_reader.read(0, random.Random(0))
    batch = collate_records([rec])
    # zero-jitter uniform DZI = the deterministic center of the training
    # distribution, which includes the 1.5x pad the eval loader applies.
    # (The reference's DZI 'none'/ori branch drops the pad — crops there
    # are 1.5x tighter than eval; kept reference-faithful, so this test
    # pins the PADDED convention both sides actually serve with.)
    tr = preprocess_batch(jax.random.PRNGKey(0), batch,
                          img_size=IMG_SIZE, out_res=OUT_RES, train=True,
                          color_aug_prob=0.0, mask_pro=0.0,
                          dzi_scale_ratio=0.0, dzi_shift_ratio=0.0)

    image, det, cam_k = eval_reader.read(0)
    built, keep = build_instance_batch(image, det, cam_k, "Real",
                                       img_size=IMG_SIZE, out_res=OUT_RES,
                                       max_instances=4)
    s = 0  # first instance slot

    # geometry of the crop must agree exactly
    np.testing.assert_allclose(np.asarray(tr["bbox_center"][0]),
                               built["bbox_center"][s], atol=1e-3)
    np.testing.assert_allclose(np.asarray(tr["img_scale"][0]),
                               built["img_scale"][s], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tr["resize_ratio"][0]),
                               built["resize_ratio"][s], rtol=1e-5)

    # scale-net conditioning inputs
    np.testing.assert_allclose(np.asarray(tr["roi_wh"][0]),
                               built["roi_wh"][s], atol=1.0)
    np.testing.assert_array_equal(np.asarray(tr["one_hot"][0]),
                                  built["one_hot"][s])
    np.testing.assert_allclose(np.asarray(tr["mean_size"][0]),
                               built["mean_size"][s], rtol=1e-6)

    # image content: both paths run the SAME resampler arithmetic
    # (device matmul vs its host numpy mirror), so they must agree to
    # f32 rounding — no resampler-skew allowance.
    tr_roi = np.asarray(tr["roi_img"][0])
    ev_roi = built["roi_img"][s]
    assert tr_roi.shape == ev_roi.shape
    np.testing.assert_allclose(tr_roi, ev_roi, atol=1e-3)

    np.testing.assert_allclose(np.asarray(tr["roi_mask"][0]),
                               built["roi_mask"][s], atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr["roi_coord_2d"][0]),
                               built["roi_coord_2d"][s], atol=1e-6)

    tr_full = np.asarray(tr["full_img"][0])
    ev_full = built["full_img"][0]
    np.testing.assert_allclose(tr_full, ev_full, atol=1e-3)
