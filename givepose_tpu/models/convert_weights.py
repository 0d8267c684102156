"""timm ConvNeXt checkpoint -> flax params converter.

The reference downloads ImageNet-pretrained convnext_base through timm
(network/backbone.py:36-46).  This environment has no egress, so the
converter takes a checkpoint FILE (torch .pth state_dict or a dict of
numpy arrays with timm names) and rewrites it into the
givepose_tpu.models.convnext parameter tree:

  timm                                  flax (this repo)
  stem.0.{weight,bias}            ->    stem_conv.{kernel,bias}
  stem.1.{weight,bias}            ->    stem_norm.{scale,bias}
  stages.S.downsample.0.*         ->    downsample_normS.{scale,bias}
  stages.S.downsample.1.*         ->    downsample_convS.{kernel,bias}
  stages.S.blocks.B.conv_dw.*     ->    stageS_blockB.Conv_0.*
  stages.S.blocks.B.norm.*        ->    stageS_blockB.LayerNorm_0.*
  stages.S.blocks.B.mlp.fc1.*     ->    stageS_blockB.Dense_0.*
  stages.S.blocks.B.mlp.fc2.*     ->    stageS_blockB.Dense_1.*
  stages.S.blocks.B.gamma         ->    stageS_blockB.gamma

Layout changes: conv OIHW->HWIO (depthwise (C,1,K,K)->(K,K,1,C)),
linear (O,I)->(I,O).
"""

from __future__ import annotations

import re

import numpy as np


def _to_numpy(v):
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _to_numpy(v) for k, v in obj.items()}


def convert_convnext(state: dict) -> dict:
    """timm-named arrays -> flax param tree for models.convnext.ConvNeXt."""
    params: dict = {}

    def put(path: list[str], leaf: str, value):
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = np.asarray(value)

    for name, v in state.items():
        v = _to_numpy(v)
        if name.startswith("stem.0."):
            leaf = "kernel" if name.endswith("weight") else "bias"
            if leaf == "kernel":
                v = v.transpose(2, 3, 1, 0)          # OIHW -> HWIO
            put(["stem_conv"], leaf, v)
        elif name.startswith("stem.1."):
            leaf = "scale" if name.endswith("weight") else "bias"
            put(["stem_norm"], leaf, v)
        elif ".downsample." in name:
            m = re.match(r"stages\.(\d+)\.downsample\.(\d)\.(\w+)", name)
            s, idx, leaf_t = int(m.group(1)), int(m.group(2)), m.group(3)
            if idx == 0:   # LN
                leaf = "scale" if leaf_t == "weight" else "bias"
                put([f"downsample_norm{s}"], leaf, v)
            else:          # 2x2 conv
                leaf = "kernel" if leaf_t == "weight" else "bias"
                if leaf == "kernel":
                    v = v.transpose(2, 3, 1, 0)
                put([f"downsample_conv{s}"], leaf, v)
        elif ".blocks." in name:
            m = re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)", name)
            s, b, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            block = f"stage{s}_block{b}"
            if rest.startswith("conv_dw."):
                leaf = "kernel" if rest.endswith("weight") else "bias"
                if leaf == "kernel":
                    # torch depthwise (C,1,K,K) -> flax (K,K,1,C)
                    v = v.transpose(2, 3, 1, 0)
                put([block, "Conv_0"], leaf, v)
            elif rest.startswith("norm."):
                leaf = "scale" if rest.endswith("weight") else "bias"
                put([block, "LayerNorm_0"], leaf, v)
            elif rest.startswith("mlp.fc1."):
                leaf = "kernel" if rest.endswith("weight") else "bias"
                if leaf == "kernel":
                    v = v.T
                put([block, "Dense_0"], leaf, v)
            elif rest.startswith("mlp.fc2."):
                leaf = "kernel" if rest.endswith("weight") else "bias"
                if leaf == "kernel":
                    v = v.T
                put([block, "Dense_1"], leaf, v)
            elif rest == "gamma":
                put([block], "gamma", v)
        # classifier head / norm_pre are dropped (features_only)
    return params


def load_pretrained_backbone(path: str) -> dict:
    """Checkpoint file -> {'params': tree} for ConvNeXt.apply."""
    return {"params": convert_convnext(load_torch_state_dict(path))}
