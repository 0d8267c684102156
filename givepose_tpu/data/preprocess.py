"""Fused on-device preprocessing graph.

The reference preprocesses per-sample in DataLoader workers:
DZI bbox jitter (tools/dataset_utils.py:32-82), seven cv2.warpAffine crops
(datasets/load_data_nocs.py:277-331), normalization, mask deformation
(data_augmentation.py:11-33) and imgaug color jitter (:508-617) — a host
hot loop.  Here the whole graph is one jitted function over the batch:

  * DZI jitter draws from jax.random (uniform type: scale in [0.75,1.25],
    shift +-0.25, pad 1.5 — same distributions, different stream);
  * all crops are the separable matmul resampler (ops.resample) — the
    roi/mask/coord/ivfc crops use NEAREST like the reference;
  * the 2D pixel-coordinate crop is computed in closed form (the grid is
    analytic, no need to warp a full-res grid);
  * mask deformation = 2x2 min/max morphology band + Bernoulli(0.5) fill
    (reference defor_2D semantics; its cv2.erode(mask, kernel, rand_r)
    call passes rand_r into the dst slot, so iterations is always 1);
  * color augmentation (data.augment) runs on the full image before
    cropping, matching the reference order.

All of it compiles into the training step, so the host only decodes PNGs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from givepose_tpu.data.augment import color_augment, defor_2d_mask
from givepose_tpu.data.records import IMG_MEAN, IMG_STD
from givepose_tpu.ops.resample import (
    affine_crop_params,
    batched_crop_resize,
    resize_matrix,
)


def dzi_jitter(key, bbox, im_h, im_w, pad_scale=1.5, scale_ratio=0.25,
               shift_ratio=0.25, dzi_type="uniform"):
    """Batched DZI bbox jitter (reference aug_bbox_DZI, uniform type).

    bbox (B, 4) xyxy -> (center (B,2), scale (B,))
    """
    x1, y1, x2, y2 = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    bw, bh = x2 - x1, y2 - y1
    base = jnp.maximum(bh, bw)
    if dzi_type == "none":
        center = jnp.stack([cx, cy], axis=1)
        scale = jnp.minimum(base, max(im_h, im_w))
        return center, scale
    k1, k2 = jax.random.split(key)
    if dzi_type == "uniform":
        ratio = 1.0 + scale_ratio * jax.random.uniform(
            k1, bw.shape, minval=-1.0, maxval=1.0)
    elif dzi_type == "uniform_sr":
        ratio = 1.0 - 0.25 * jax.random.uniform(k1, bw.shape)
    else:
        raise NotImplementedError(dzi_type)
    shift = shift_ratio * jax.random.uniform(k2, (bw.shape[0], 2),
                                             minval=-1.0, maxval=1.0)
    center = jnp.stack([cx + bw * shift[:, 0], cy + bh * shift[:, 1]],
                       axis=1)
    scale = jnp.minimum(base * ratio * pad_scale, float(max(im_h, im_w)))
    return center, scale


def crop_coord_2d(center, scale, out_res, im_w, im_h):
    """Closed-form nearest-sampled crop of the normalized pixel grid.

    Equivalent to warping get_2d_coord_np's grid (reference :238,285-287):
    source pixel = round(a*j + b), normalized to [-1,1] by (v-(n-1)/2)/((n-1)/2).
    Returns (B, out, out, 2) with x in channel 0.
    """
    a, bx, by = affine_crop_params(center, scale, out_res)
    j = jnp.arange(out_res, dtype=jnp.float32)
    sx = jnp.floor(a[:, None] * j + bx[:, None] + 0.5)
    sy = jnp.floor(a[:, None] * j + by[:, None] + 0.5)
    nx = (sx - (im_w - 1) / 2) / ((im_w - 1) / 2)
    ny = (sy - (im_h - 1) / 2) / ((im_h - 1) / 2)
    xx = jnp.broadcast_to(nx[:, None, :], (nx.shape[0], out_res, out_res))
    yy = jnp.broadcast_to(ny[:, :, None], (ny.shape[0], out_res, out_res))
    # cv2.warpAffine zero border (reference :285-287): cells whose
    # nearest source pixel is outside the image get (0,0), not the
    # extrapolated grid value (matches ops/resample.crop_coord_2d_np)
    valid = ((sx >= 0) & (sx <= im_w - 1))[:, None, :] \
        & ((sy >= 0) & (sy <= im_h - 1))[:, :, None]
    return jnp.stack([xx, yy], axis=-1) * valid[..., None]


@partial(jax.jit, static_argnames=("img_size", "out_res", "train",
                                   "color_aug_prob", "resize_full",
                                   "mask_pro", "dzi_type",
                                   "dzi_pad_scale", "dzi_scale_ratio",
                                   "dzi_shift_ratio"))
def preprocess_batch(key, batch: dict, img_size: int = 256,
                     out_res: int = 64, train: bool = True,
                     color_aug_prob: float = 0.8, resize_full: bool = True,
                     mask_pro: float = 0.5, dzi_type: str = "uniform",
                     dzi_pad_scale: float = 1.5,
                     dzi_scale_ratio: float = 0.25,
                     dzi_shift_ratio: float = 0.25) -> dict:
    """Full-res host arrays -> model-ready crops, all on device.

    batch keys (stacked over B):
      image (B,H,W,3) uint8/f32, mask (B,H,W), nocs_coord (B,H,W,3),
      ivfc_coord (B,H,W,3), ivfc_mask (B,H,W), bbox (B,4 xyxy),
      plus pass-through metadata (cam_K, rotation, ...).

    DZI knobs mirror the reference FLAGS (config/config.py:30-33) and
    only apply when ``train``; eval mode uses the reference's
    ``ori=True`` branch (tools/dataset_utils.py:44-48, NO pad factor —
    note the detection-driven eval loader pads by DZI_PAD_SCALE instead,
    load_data_eval.py:267, mirrored in eval/load_eval.py).
    """
    img = batch["image"].astype(jnp.float32)
    b, im_h, im_w = img.shape[:3]
    k_dzi, k_color, k_mask = jax.random.split(key, 3)

    if train and color_aug_prob > 0:
        img = color_augment(k_color, img, prob=color_aug_prob)

    if train:
        center, scale = dzi_jitter(k_dzi, batch["bbox"], im_h, im_w,
                                   pad_scale=dzi_pad_scale,
                                   scale_ratio=dzi_scale_ratio,
                                   shift_ratio=dzi_shift_ratio,
                                   dzi_type=dzi_type)
    else:
        center, scale = dzi_jitter(k_dzi, batch["bbox"], im_h, im_w,
                                   dzi_type="none")

    # roi crop: reference uses INTER_NEAREST for the rgb roi (:277-279)
    roi_img = batched_crop_resize(img, center, scale, img_size, "nearest")
    roi_img_origin = roi_img / 255.0
    roi_img = (roi_img / 255.0 - IMG_MEAN) / IMG_STD

    mask = batch["mask"].astype(jnp.float32)[..., None]
    roi_mask = batched_crop_resize(mask, center, scale, img_size,
                                   "nearest")
    roi_mask_out = batched_crop_resize(mask, center, scale, out_res,
                                       "nearest")
    roi_nocs = batched_crop_resize(batch["nocs_coord"].astype(jnp.float32),
                                   center, scale, out_res, "nearest")
    roi_ivfc = batched_crop_resize(batch["ivfc_coord"].astype(jnp.float32),
                                   center, scale, out_res, "nearest")
    roi_ivfc_mask = batched_crop_resize(
        batch["ivfc_mask"].astype(jnp.float32)[..., None], center, scale,
        out_res, "nearest")

    coord2d = crop_coord_2d(center, scale, out_res, im_w, im_h)

    if train:
        roi_mask_deform = defor_2d_mask(k_mask, roi_mask[..., 0],
                                        prob=mask_pro)[..., None]
    else:
        roi_mask_deform = roi_mask

    # full image for the scale net (reference :349-351)
    if resize_full:
        a_full = jnp.full((b,), im_w / float(img_size), jnp.float32)
        # cv2.resize maps with pixel-center alignment: src = (dst+0.5)*a-0.5
        wy = resize_matrix(im_h, img_size,
                           jnp.full((b,), im_h / img_size, jnp.float32),
                           jnp.full((b,), 0.5 * im_h / img_size - 0.5,
                                    jnp.float32), "bilinear")
        wx = resize_matrix(im_w, img_size, a_full,
                           0.5 * a_full - 0.5, "bilinear")
        full = jnp.einsum("boh,bhwc->bowc", wy, img, precision="highest")
        full = jnp.einsum("bpw,bowc->bopc", wx, full, precision="highest")
    else:
        full = img
    full_img = (full / 255.0 - IMG_MEAN) / IMG_STD

    bbox = batch["bbox"]
    bw = (jnp.clip(bbox[:, 2], 0, im_w) - jnp.clip(bbox[:, 0], 0, im_w))
    bh = (jnp.clip(bbox[:, 3], 0, im_h) - jnp.clip(bbox[:, 1], 0, im_h))

    one_hot = jax.nn.one_hot(batch["cat_id0"], 6, dtype=jnp.float32)

    out = {
        "roi_img": roi_img,
        "roi_img_origin": roi_img_origin,
        "roi_mask": roi_mask,
        "roi_mask_output": roi_mask_out,
        "roi_mask_deform": roi_mask_deform,
        "nocs_coord": roi_nocs,
        "ivfc_coord": roi_ivfc,
        "roi_ivfc_mask_output": roi_ivfc_mask,
        "roi_coord_2d": coord2d,
        "full_img": full_img,
        "one_hot": one_hot,
        "bbox_center": center,
        "img_scale": scale,
        "resize_ratio": out_res / scale,
        "roi_wh": jnp.stack([bw, bh], axis=1),
    }
    # pass-through labels / metadata
    for k in ("cam_K", "rotation", "translation", "nocs_scale", "real_size",
              "mean_size", "sym_info", "model_point", "cat_id0"):
        if k in batch:
            out[k] = batch[k]
    return out


def collate_records(records) -> dict:
    """Stack host Records into the raw array batch preprocess_batch eats."""
    return {
        "image": np.stack([r.image for r in records]),
        "mask": np.stack([r.mask for r in records]),
        "nocs_coord": np.stack([r.nocs_coord for r in records]),
        "ivfc_coord": np.stack([r.ivfc_coord for r in records]),
        "ivfc_mask": np.stack([r.ivfc_mask for r in records]),
        "bbox": np.stack([r.bbox for r in records]),
        "cat_id0": np.asarray([r.cat_id0 for r in records], np.int32),
        "cam_K": np.stack([r.cam_k for r in records]),
        "rotation": np.stack([r.rotation for r in records]),
        "translation": np.stack([r.translation for r in records]),
        "nocs_scale": np.asarray([r.nocs_scale for r in records],
                                 np.float32),
        "real_size": np.stack([r.real_size for r in records]),
        "mean_size": np.stack([r.mean_size for r in records]),
        "sym_info": np.stack([r.sym for r in records]),
        "model_point": np.stack([r.model_points for r in records]),
    }
