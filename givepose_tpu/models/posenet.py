"""PoseNet: the flagship GIVEPose model (NHWC, flax).

Graph (reference network/PoseNet.py:134-231, shapes from SURVEY.md §3.3):
  roi_img (B,256,256,3)
   └─ ConvNeXt-B ─ feat (B,8,8,1024)
       ├─ SizeHead ─ size residual + normalized mean size
       ├─ TopDownXyzHead ─ NOCS map (B,64,64,3)
       │    └─ MAPEncoder (DCNv3) ─ nocs_feat (B,8,8,256)
       ├─ feat_reducer 1x1 ─ (B,8,8,256) ─ concat ─ (B,8,8,512)
       │    └─ TopDownXyzHead ─ IVFC map (B,64,64,3)
       └─ IVFC ⊕ roi_coord_2d ─ ConvPnPNet ─ rot6d, (cx,cy,z)
  rot6d → R → allo→ego with centroid-z backprojection → (R, t)

The pose assembly is the batched differentiable path for BOTH train and
eval (the reference's per-instance numpy eval loop,
pose_from_pred_centroid_z.py:121-157, is replaced by the same jitted math).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from givepose_tpu.core.config import ModelConfig
from givepose_tpu.geometry import get_rot_mat, pose_from_pred_centroid_z
from givepose_tpu.models.convnext import convnext_base, convnext_tiny
from givepose_tpu.models.heads import (
    ConvPnPNet,
    MAPEncoder,
    SizeHead,
    TopDownXyzHead,
)

Dtype = Any


class PoseNet(nn.Module):
    cfg: ModelConfig = ModelConfig()
    backbone_variant: str = "base"     # base | tiny (tests) | custom
    # used when backbone_variant == "custom" (differential tests against
    # the torch reference use a shrunk stride-32 backbone)
    backbone_depths: tuple = (3, 3, 27, 3)
    backbone_dims: tuple = (128, 256, 512, 1024)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False,
                 is_wild6d: bool = False, dropblock_rate=0.0) -> dict:
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" \
            else jnp.float32
        img = batch["roi_img"].astype(dtype)           # (B,256,256,3)

        gelu = "gelu_exact" if self.cfg.gelu_exact else "gelu"
        quant = getattr(self.cfg, "quant_dense", False)
        if self.backbone_variant == "base":
            backbone = convnext_base(dtype=dtype,
                                     gelu_exact=self.cfg.gelu_exact,
                                     quant=quant)
        elif self.backbone_variant == "custom":
            from givepose_tpu.models.convnext import ConvNeXt
            backbone = ConvNeXt(depths=self.backbone_depths,
                                dims=self.backbone_dims,
                                gelu_exact=self.cfg.gelu_exact,
                                quant=quant,
                                dtype=dtype)
        else:
            backbone = convnext_tiny(dtype=dtype,
                                     gelu_exact=self.cfg.gelu_exact,
                                     quant=quant)
        feat = backbone(img, deterministic=not train)  # (B,8,8,1024)

        size_resid = SizeHead(feat_dim=self.cfg.feat_ts,
                              out_dim=self.cfg.size_head_out_dim,
                              dtype=dtype, name="size_head")(
            feat, deterministic=not train)

        cx, cy, cz = TopDownXyzHead(act=gelu, dtype=dtype,
                                    name="xyz_nocs_head")(feat)
        coor_nocs = jnp.concatenate([cx, cy, cz], axis=-1)  # (B,64,64,3) f32

        if self.cfg.nocsmap_encoder == "conv":
            nocs_feat = MAPEncoder(use_dcn=self.cfg.use_dcn,
                                   dcn_impl=self.cfg.dcn_impl,
                                   dcn_window=self.cfg.dcn_window,
                                   gelu_exact=self.cfg.gelu_exact,
                                   drop_prob=self.cfg.drop_prob,
                                   dropblock_size=self.cfg.dropblock_size,
                                   dtype=dtype,
                                   name="nocs_encoder")(
                coor_nocs.astype(dtype),
                dropblock_rate=dropblock_rate,
                deterministic=not train)
        elif self.cfg.nocsmap_encoder == "att":
            from givepose_tpu.models.attention import MAPTransformerEncoder
            nocs_feat = MAPTransformerEncoder(dtype=dtype,
                                              name="nocs_encoder")(
                coor_nocs.astype(dtype))
        else:
            raise NotImplementedError(self.cfg.nocsmap_encoder)

        feat256 = nn.Conv(256, (1, 1), dtype=dtype,
                          param_dtype=jnp.float32,
                          name="feat_reducer")(feat)
        feat_cat = jnp.concatenate([feat256, nocs_feat.astype(dtype)],
                                   axis=-1)            # (B,8,8,512)
        ix, iy, iz = TopDownXyzHead(act=gelu, dtype=dtype,
                                    name="xyz_deform_head")(feat_cat)
        coor_ivfc = jnp.concatenate([ix, iy, iz], axis=-1)

        coord2d = batch["roi_coord_2d"]                # (B,64,64,2)
        pnp_in = jnp.concatenate(
            [coor_ivfc.astype(dtype), coord2d.astype(dtype)], axis=-1)

        mask_out = batch.get("roi_mask_out")
        rot_raw, t_raw, _ = ConvPnPNet(
            featdim=self.cfg.pose_head_featdim,
            rot_dim=4 if "quat" in self.cfg.r_type else 6,
            mask_attention_type=self.cfg.mask_attention_type,
            flat_op=self.cfg.flat_op,
            drop_prob=self.cfg.drop_prob,
            dropblock_size=self.cfg.dropblock_size, dtype=dtype,
            name="pnp_net")(pnp_in, mask_attention=mask_out,
                            dropblock_rate=dropblock_rate,
                            deterministic=not train)

        # size: residual + normalized per-category mean size
        # (reference PoseNet.py:199-202)
        mean_size = batch["mean_size"].astype(jnp.float32)
        mean_scale = jnp.linalg.norm(mean_size, axis=1, keepdims=True)
        pred_size = size_resid + mean_size / mean_scale

        rot_m = get_rot_mat(rot_raw, self.cfg.r_type)

        # t_type 'site' predicts a centroid offset; 'center' zeroes it
        # (reference PoseNet.py:217)
        centroids = t_raw[:, :2]
        if self.cfg.t_type == "center":
            centroids = centroids * 0

        rot_ego, trans = pose_from_pred_centroid_z(
            rot_m,
            pred_centroids=centroids,
            pred_z_vals=t_raw[:, 2:3],
            roi_cams=batch["cam_K"].astype(jnp.float32),
            roi_centers=batch["bbox_center"].astype(jnp.float32),
            resize_ratios=batch["resize_ratio"].astype(jnp.float32),
            roi_whs=batch["roi_wh"].astype(jnp.float32),
            is_allo="allo" in self.cfg.r_type,
            z_type=self.cfg.z_type,
            is_wild6d=is_wild6d,
        )
        return {
            "rot": rot_ego,
            "trans": trans,
            "size": pred_size,
            "nocs_coor": coor_nocs,
            "ivfc_coor": coor_ivfc,
            "rot_raw": rot_raw,
            "t_raw": t_raw,
        }
