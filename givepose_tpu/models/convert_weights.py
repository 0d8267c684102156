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
  stages.S.blocks.B.conv_dw.*     ->    stageS_blockB.dw_kernel/dw_bias
  stages.S.blocks.B.norm.*        ->    stageS_blockB.dw_ln_scale/_bias
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
                if rest.endswith("weight"):
                    # torch depthwise (C,1,K,K) -> block-owned (K,K,C)
                    put([block], "dw_kernel",
                        v.transpose(2, 3, 1, 0)[:, :, 0, :])
                else:
                    put([block], "dw_bias", v)
            elif rest.startswith("norm."):
                leaf = ("dw_ln_scale" if rest.endswith("weight")
                        else "dw_ln_bias")
                put([block], leaf, v)
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


def _put(tree: dict, path: list[str], leaf: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = np.asarray(value)


def _conv_kernel(v):
    return _to_numpy(v).transpose(2, 3, 1, 0)          # OIHW -> HWIO


def _convert_xyz_head(state: dict, prefix: str, out: dict, name: str):
    """Reference TopDownXyzHead (xyz_head.py:195-366) -> our flax head.

    torch ModuleList flat indices with up_types (deconv,bilinear,bilinear)
    and 2 ConvModules per block:
      0 deconv / 1 GN / 2 act / 3,4 ConvModule    (deconv block)
      5 upsample / 6,7 ConvModule                 (bilinear block 1)
      8 upsample / 9,10 ConvModule                (bilinear block 2)
    """
    conv_map = {3: 0, 4: 1, 6: 2, 7: 3, 9: 4, 10: 5}
    for key, v in state.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        if rest.startswith("features."):
            parts = rest.split(".")
            idx = int(parts[1])
            if idx == 0:           # deconv weight (in, out, kh, kw)
                _put(out, [name, "DeconvModule_0", "ConvTranspose_0"],
                     "kernel", _to_numpy(v).transpose(2, 3, 1, 0))
            elif idx == 1:         # deconv GN
                leaf = "scale" if parts[2] == "weight" else "bias"
                _put(out, [name, "DeconvModule_0", "GroupNorm32_0",
                           "GroupNorm_0"], leaf, _to_numpy(v))
            elif idx in conv_map:
                mod = f"ConvModule_{conv_map[idx]}"
                if parts[2] == "conv":
                    _put(out, [name, mod, "Conv_0"], "kernel",
                         _conv_kernel(v))
                elif parts[2] == "gn":   # 'norm.*' keys alias the same GN
                    leaf = "scale" if parts[3] == "weight" else "bias"
                    _put(out, [name, mod, "GroupNorm32_0", "GroupNorm_0"],
                         leaf, _to_numpy(v))
        elif rest.startswith("out_layer."):
            leaf = "kernel" if rest.endswith("weight") else "bias"
            v = _conv_kernel(v) if leaf == "kernel" else _to_numpy(v)
            _put(out, [name, "out_layer"], leaf, v)


def _convert_dcnv3_c(state: dict, prefix: str, out: dict, path: list[str]):
    """Reference DCNv3_C / DCNv3 module params -> our DCNv3Conv tree.

    The wrapper's ``bn`` is dead (its forward comments out bn+gelu,
    network/dcnv3.py:36-37) and is skipped.
    """
    for key, v in state.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        if rest.startswith("conv."):
            leaf = "kernel" if rest.endswith("weight") else "bias"
            v = _conv_kernel(v) if leaf == "kernel" else _to_numpy(v)
            _put(out, path + ["proj"], leaf, v)
        elif rest.startswith("dcnv3.dw_conv.0."):
            leaf = "kernel" if rest.endswith("weight") else "bias"
            v = _conv_kernel(v) if leaf == "kernel" else _to_numpy(v)
            _put(out, path + ["dcnv3", "dw_conv"], leaf, v)
        elif rest.startswith("dcnv3.dw_conv.1.1."):
            leaf = "scale" if rest.endswith("weight") else "bias"
            _put(out, path + ["dcnv3", "dw_norm"], leaf, _to_numpy(v))
        elif rest.startswith("dcnv3."):
            sub = rest.split(".")[1]
            if sub in ("offset", "mask", "input_proj", "output_proj"):
                leaf = "kernel" if rest.endswith("weight") else "bias"
                v = _to_numpy(v).T if leaf == "kernel" else _to_numpy(v)
                _put(out, path + ["dcnv3", sub], leaf, v)


def convert_posenet(state: dict) -> dict:
    """Full reference PoseNet state_dict (network/PoseNet.py:134-231) ->
    flax variables {'params': ..., 'batch_stats': ...} for models.PoseNet.

    Backbone keys must use timm names under the ``backbone.`` prefix.
    """
    params: dict = {}
    batch_stats: dict = {}

    backbone_state = {k[len("backbone."):]: v for k, v in state.items()
                      if k.startswith("backbone.")}
    params["ConvNeXt_0"] = convert_convnext(backbone_state)

    _convert_xyz_head(state, "xyz_nocs_head.", params, "xyz_nocs_head")
    _convert_xyz_head(state, "xyz_deform_head.", params, "xyz_deform_head")

    # nocs_encoder: ModuleList [DCNv3_C, GN, act] x3 -> dcn{i} + GN32_{i};
    # plain-conv variant ([Conv2d, GN, act] x3) -> conv{i} + GN32_{i}
    for i, idx in enumerate((0, 3, 6)):
        conv_w = state.get(f"nocs_encoder.features.{idx}.weight")
        if conv_w is not None and _to_numpy(conv_w).ndim == 4:
            _put(params, ["nocs_encoder", f"conv{i}"], "kernel",
                 _conv_kernel(conv_w))
        else:
            _convert_dcnv3_c(state, f"nocs_encoder.features.{idx}.",
                             params, ["nocs_encoder", f"dcn{i}"])
        gn_w = state[f"nocs_encoder.features.{idx + 1}.weight"]
        gn_b = state[f"nocs_encoder.features.{idx + 1}.bias"]
        _put(params, ["nocs_encoder", f"GroupNorm32_{i}", "GroupNorm_0"],
             "scale", _to_numpy(gn_w))
        _put(params, ["nocs_encoder", f"GroupNorm32_{i}", "GroupNorm_0"],
             "bias", _to_numpy(gn_b))

    # feat_reducer 1x1 conv
    _put(params, ["feat_reducer"], "kernel",
         _conv_kernel(state["feat_reducer.weight"]))
    _put(params, ["feat_reducer"], "bias",
         _to_numpy(state["feat_reducer.bias"]))

    # pnp_net convs + GNs + fc stack
    for i, idx in enumerate((0, 3, 6)):
        _put(params, ["pnp_net", f"conv{i}"], "kernel",
             _conv_kernel(state[f"pnp_net.features.{idx}.weight"]))
        _put(params, ["pnp_net", f"GroupNorm32_{i}", "GroupNorm_0"],
             "scale", _to_numpy(state[f"pnp_net.features.{idx + 1}.weight"]))
        _put(params, ["pnp_net", f"GroupNorm32_{i}", "GroupNorm_0"],
             "bias", _to_numpy(state[f"pnp_net.features.{idx + 1}.bias"]))
    for fc in ("fc1", "fc2", "fc1_z", "fc2_z", "fc_z", "fc_r", "fc_t"):
        _put(params, ["pnp_net", fc], "kernel",
             _to_numpy(state[f"pnp_net.{fc}.weight"]).T)
        _put(params, ["pnp_net", fc], "bias",
             _to_numpy(state[f"pnp_net.{fc}.bias"]))

    # size_head: conv1d(1x1) == Dense; BatchNorm running stats
    for t_name, f_name in (("conv1", "conv1"), ("conv2", "conv2")):
        w = _to_numpy(state[f"size_head.{t_name}.weight"])[:, :, 0].T
        _put(params, ["size_head", f_name], "kernel", w)
        _put(params, ["size_head", f_name], "bias",
             _to_numpy(state[f"size_head.{t_name}.bias"]))
    _put(params, ["size_head", "bn1"], "scale",
         _to_numpy(state["size_head.bn1.weight"]))
    _put(params, ["size_head", "bn1"], "bias",
         _to_numpy(state["size_head.bn1.bias"]))
    _put(batch_stats, ["size_head", "bn1"], "mean",
         _to_numpy(state["size_head.bn1.running_mean"]))
    _put(batch_stats, ["size_head", "bn1"], "var",
         _to_numpy(state["size_head.bn1.running_var"]))

    return {"params": params, "batch_stats": batch_stats}


def load_pretrained_posenet(path: str) -> dict:
    """Reference PoseNet .pth checkpoint -> flax variables."""
    return convert_posenet(load_torch_state_dict(path))
