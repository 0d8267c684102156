"""Differential test: our flax PoseNet vs the ACTUAL reference
``network/PoseNet.py`` running unmodified on CPU (via tests/ref_shim.py),
with weights converted through ``models.convert_weights.convert_posenet``
— the same converter used to load released reference checkpoints.

The reference's compiled DCNv3 cannot run here and its pure-pytorch
fallback (DCNv3_pytorch) is shape-broken at stride>1 (full-res offsets
meet strided reference points, dcnv3_func.py:186-199 — the CUDA kernel
silently aliases instead, see models/dcnv3_module.py docstring).  The
torch side therefore uses a thin wrapper around the reference's own
``dcnv3_core_pytorch`` with offsets computed at the strided query
positions — exactly our documented semantics — so every other piece of
the graph (backbone, heads, pose assembly) is the genuine reference code.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from givepose_tpu.core.config import ModelConfig
from givepose_tpu.models import PoseNet
from givepose_tpu.models.convert_weights import convert_posenet

from tests import ref_shim

# shrink the shim backbone: PoseNet hardcodes feature_channel=1024, and
# the 256^2 crop + stride-32 + 64^2 maps pipeline fixes every other shape
DEPTHS = (1, 1, 1, 1)
DIMS = (24, 48, 96, 1024)
ref_shim.CONVNEXT_KW = dict(depths=DEPTHS, dims=DIMS)


@pytest.fixture(scope="module")
def ref_modules():
    ref = ref_shim.import_reference()
    conv_pnp_net = ref("network.conv_pnp_net")
    modules_dcnv3 = ref("network.ops_dcnv3.modules.dcnv3")
    dcnv3_func = ref("network.ops_dcnv3.functions.dcnv3_func")
    posenet_mod = ref("network.PoseNet")
    return conv_pnp_net, modules_dcnv3, dcnv3_func, posenet_mod


def make_cpu_dcnv3_c(modules_dcnv3, dcnv3_func):
    """DCNv3_C stand-in: reference DCNv3_pytorch params + reference core,
    offsets computed at strided query positions (our semantics)."""

    class DCNv3StridedOffsets(modules_dcnv3.DCNv3_pytorch):
        def forward(self, inp):
            n, h, w, _ = inp.shape
            x = self.input_proj(inp)
            x1 = inp.permute(0, 3, 1, 2)
            x1 = self.dw_conv(x1)                  # (N,H,W,C) channels-last
            if self.stride > 1:
                x1 = x1[:, ::self.stride, ::self.stride, :]
            hs, ws = x1.shape[1:3]
            offset = self.offset(x1)
            mask = self.mask(x1).reshape(n, hs, ws, self.group, -1)
            mask = F.softmax(mask, -1).reshape(n, hs, ws, -1)
            x = dcnv3_func.dcnv3_core_pytorch(
                x, offset, mask, self.kernel_size, self.kernel_size,
                self.stride, self.stride, self.pad, self.pad,
                self.dilation, self.dilation, self.group,
                self.group_channels, self.offset_scale, self.remove_center)
            return self.output_proj(x)

    class DCNv3_C_cpu(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size=1,
                     stride=1, groups=4, dilation=1, padding=1, bias=False):
            super().__init__()
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size=1)
            self.dcnv3 = DCNv3StridedOffsets(
                out_channels, kernel_size=kernel_size, stride=stride,
                group=groups, dilation=dilation)
            self.bn = nn.BatchNorm2d(out_channels)   # dead, parity keys

        def forward(self, x):
            x = self.conv(x)
            x = x.permute(0, 2, 3, 1)
            x = self.dcnv3(x)
            return x.permute(0, 3, 1, 2)

    return DCNv3_C_cpu


def _make_batch(rng, bs=2):
    img = rng.normal(size=(bs, 256, 256, 3)).astype(np.float32) * 0.5
    coord2d = rng.uniform(-1, 1, (bs, 64, 64, 2)).astype(np.float32)
    cam_k = np.tile(np.array([[591.0, 0, 322.5], [0, 590.0, 244.5],
                              [0, 0, 1]], np.float32), (bs, 1, 1))
    return {
        "roi_img": img,
        "roi_coord_2d": coord2d,
        "cam_K": cam_k,
        "mean_size": rng.uniform(0.1, 0.3, (bs, 3)).astype(np.float32),
        "bbox_center": rng.uniform(100, 400, (bs, 2)).astype(np.float32),
        "resize_ratio": rng.uniform(0.2, 0.5, (bs,)).astype(np.float32),
        "roi_wh": rng.uniform(50, 200, (bs, 2)).astype(np.float32),
        "roi_mask": (rng.random((bs, 256, 256, 1)) < 0.5
                     ).astype(np.float32),
    }


class TestPoseNetDifferential:
    @pytest.mark.parametrize("use_dcn", ["dcnv3", ""])
    def test_forward_matches_reference(self, ref_modules, use_dcn):
        """Both MAPEncoder variants: DCNv3 (reference default) and the
        plain-conv branch (conv_pnp_net.py:254-258, FLAGS.use_dcn='') —
        the latter is the bench flagship config."""
        import absl.flags

        conv_pnp_net, modules_dcnv3, dcnv3_func, posenet_mod = ref_modules
        dcn_cpu = make_cpu_dcnv3_c(modules_dcnv3, dcnv3_func)
        orig = conv_pnp_net.DCNv3_C
        orig_flag = absl.flags.FLAGS.use_dcn
        conv_pnp_net.DCNv3_C = dcn_cpu
        absl.flags.FLAGS.use_dcn = use_dcn
        try:
            torch.manual_seed(0)
            net = posenet_mod.PoseNet().eval()
        finally:
            conv_pnp_net.DCNv3_C = orig
            absl.flags.FLAGS.use_dcn = orig_flag

        # The reference's tiny-std init (0.001) makes rot6d outputs ~1e-4,
        # where Gram-Schmidt normalization amplifies f32 noise into
        # arbitrary rotations — a conditioning artifact, not a parity
        # signal.  Re-init every weight at 1/sqrt(fan_in) so activations
        # and outputs are O(1) like a trained network, and randomize the
        # zero-init offsets/masks and 1e-6 gammas so the deformable path
        # and layer-scale are exercised.
        gen = torch.Generator().manual_seed(1)
        with torch.no_grad():
            for name, p in net.named_parameters():
                if p.ndim >= 2:
                    fan_in = int(np.prod(p.shape[1:]))
                    p.copy_(torch.randn(p.shape, generator=gen)
                            / np.sqrt(fan_in))
                elif name.endswith(".gamma"):
                    p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
                elif name.endswith("fc_z.bias"):
                    # positive depth keeps the allo->ego object ray well
                    # conditioned (z near 0 makes acos/axis degenerate)
                    p.fill_(2.0)
                elif name.endswith(".bias"):
                    p.copy_(torch.randn(p.shape, generator=gen) * 0.02)

        rng = np.random.default_rng(2)
        batch = _make_batch(rng)

        data_t = {
            "roi_img": torch.from_numpy(
                batch["roi_img"].transpose(0, 3, 1, 2)),
            "roi_coord_2d": torch.from_numpy(
                batch["roi_coord_2d"].transpose(0, 3, 1, 2)),
            "cam_K": torch.from_numpy(batch["cam_K"]),
            "mean_size": torch.from_numpy(batch["mean_size"]),
            "bbox_center": torch.from_numpy(batch["bbox_center"]),
            "resize_ratio": torch.from_numpy(batch["resize_ratio"]),
            "roi_wh": torch.from_numpy(batch["roi_wh"]),
            "roi_mask": torch.from_numpy(
                batch["roi_mask"].transpose(0, 3, 1, 2)),
        }
        with torch.no_grad():
            ref_out = net(data_t, "cpu", do_loss=False)

        # ---- our side: convert the torch weights, run the flax graph ----
        state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        variables = convert_posenet(state)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)

        cfg = ModelConfig(compute_dtype="float32", dcn_impl="xla",
                          gelu_exact=True, use_dcn=use_dcn)
        model = PoseNet(cfg=cfg, backbone_variant="custom",
                        backbone_depths=DEPTHS, backbone_dims=DIMS)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        out = model.apply(variables, jb)

        np.testing.assert_allclose(
            np.asarray(out["nocs_coor"]).transpose(0, 3, 1, 2),
            ref_out["nocs_coor"].numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["ivfc_coor"]).transpose(0, 3, 1, 2),
            ref_out["ivfc_coor"].numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["size"]),
                                   ref_out["size"].numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["trans"]),
                                   ref_out["trans"].numpy(), atol=1e-4)
        # the reference's OWN train/test allo->ego paths differ by ~1.5e-4
        # (f64 numpy axangle vs f32 torch quaternion); 1e-3 bounds both
        np.testing.assert_allclose(np.asarray(out["rot"]),
                                   ref_out["rot"].numpy(), atol=1e-3)
        # sanity: the outputs are proper rotations
        r = np.asarray(out["rot"])
        np.testing.assert_allclose(r @ r.transpose(0, 2, 1),
                                   np.tile(np.eye(3), (len(r), 1, 1)),
                                   atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
