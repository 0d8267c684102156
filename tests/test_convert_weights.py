"""Weight-converter equivalence: converted torch weights must make our
flax ConvNeXt match an independent torch implementation numerically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from givepose_tpu.models.convert_weights import convert_convnext
from givepose_tpu.models.convnext import ConvNeXt


class TorchConvNeXtTiny(nn.Module):
    """Independent torch ConvNeXt (timm-compatible names) for the oracle."""

    def __init__(self, depths=(1, 1), dims=(8, 16)):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4),
            nn.LayerNorm(dims[0], eps=1e-6),
        )
        self.stages = nn.ModuleList()
        for s, (depth, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if s > 0:
                stage.downsample = nn.Sequential(
                    nn.LayerNorm(dims[s - 1], eps=1e-6),
                    nn.Conv2d(dims[s - 1], dim, 2, stride=2),
                )
            blocks = nn.ModuleList()
            for _ in range(depth):
                blk = nn.Module()
                blk.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
                blk.norm = nn.LayerNorm(dim, eps=1e-6)
                blk.mlp = nn.Module()
                blk.mlp.fc1 = nn.Linear(dim, 4 * dim)
                blk.mlp.fc2 = nn.Linear(4 * dim, dim)
                blk.gamma = nn.Parameter(torch.full((dim,), 1e-6))
                blocks.append(blk)
            stage.blocks = blocks
            self.stages.append(stage)

    def forward(self, x):                      # x NCHW
        x = self.stem[0](x)
        x = self.stem[1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for s, stage in enumerate(self.stages):
            if s > 0:
                x = stage.downsample[0](
                    x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = stage.downsample[1](x)
            for blk in stage.blocks:
                inp = x
                h = blk.conv_dw(x).permute(0, 2, 3, 1)
                h = blk.norm(h)
                h = blk.mlp.fc2(F.gelu(blk.mlp.fc1(h)))
                h = blk.gamma * h
                x = inp + h.permute(0, 3, 1, 2)
        return x


def timm_style_state_dict(model: TorchConvNeXtTiny) -> dict:
    sd = {}
    sd["stem.0.weight"] = model.stem[0].weight
    sd["stem.0.bias"] = model.stem[0].bias
    sd["stem.1.weight"] = model.stem[1].weight
    sd["stem.1.bias"] = model.stem[1].bias
    for s, stage in enumerate(model.stages):
        if s > 0:
            sd[f"stages.{s}.downsample.0.weight"] = \
                stage.downsample[0].weight
            sd[f"stages.{s}.downsample.0.bias"] = stage.downsample[0].bias
            sd[f"stages.{s}.downsample.1.weight"] = \
                stage.downsample[1].weight
            sd[f"stages.{s}.downsample.1.bias"] = stage.downsample[1].bias
        for b, blk in enumerate(stage.blocks):
            p = f"stages.{s}.blocks.{b}"
            sd[f"{p}.conv_dw.weight"] = blk.conv_dw.weight
            sd[f"{p}.conv_dw.bias"] = blk.conv_dw.bias
            sd[f"{p}.norm.weight"] = blk.norm.weight
            sd[f"{p}.norm.bias"] = blk.norm.bias
            sd[f"{p}.mlp.fc1.weight"] = blk.mlp.fc1.weight
            sd[f"{p}.mlp.fc1.bias"] = blk.mlp.fc1.bias
            sd[f"{p}.mlp.fc2.weight"] = blk.mlp.fc2.weight
            sd[f"{p}.mlp.fc2.bias"] = blk.mlp.fc2.bias
            sd[f"{p}.gamma"] = blk.gamma
    return sd


class TestWeightConversion:
    def test_flax_matches_torch_oracle(self, rng):
        torch.manual_seed(0)
        tmodel = TorchConvNeXtTiny().eval()
        # randomize gamma away from 1e-6 so the blocks matter
        with torch.no_grad():
            for stage in tmodel.stages:
                for blk in stage.blocks:
                    blk.gamma.copy_(torch.randn_like(blk.gamma) * 0.1)

        x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

        params = convert_convnext(timm_style_state_dict(tmodel))
        fmodel = ConvNeXt(depths=(1, 1), dims=(8, 16), gelu_exact=True)
        out = fmodel.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    def test_converted_tree_matches_init_shapes(self, rng):
        torch.manual_seed(1)
        tmodel = TorchConvNeXtTiny()
        params = convert_convnext(timm_style_state_dict(tmodel))
        fmodel = ConvNeXt(depths=(1, 1), dims=(8, 16), gelu_exact=True)
        x = jnp.zeros((1, 16, 16, 3))
        init_params = fmodel.init(jax.random.PRNGKey(0), x)["params"]
        flat_a = jax.tree_util.tree_leaves_with_path(init_params)
        flat_b = jax.tree_util.tree_leaves_with_path(params)
        paths_a = {jax.tree_util.keystr(p): v.shape for p, v in flat_a}
        paths_b = {jax.tree_util.keystr(p): v.shape for p, v in flat_b}
        assert paths_a == paths_b


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
