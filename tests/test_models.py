"""Model stack smoke + shape tests (CPU, tiny configs for speed)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from givepose_tpu.core.config import ModelConfig
from givepose_tpu.models import (
    PoseNet,
    ScaleNet,
    convnext_tiny,
    MAPEncoder,
    TopDownXyzHead,
    ConvPnPNet,
    SizeHead,
    DCNv3,
    MAPTransformerEncoder,
)


def make_batch(rng, b=2, img=64, out_res=16):
    K = np.tile(np.array([[577.5, 0, 319.5], [0, 577.5, 239.5],
                          [0, 0, 1]], np.float32), (b, 1, 1))
    return {
        "roi_img": jnp.asarray(rng.normal(size=(b, img, img, 3)),
                               jnp.float32),
        "roi_coord_2d": jnp.asarray(rng.uniform(-1, 1, (b, out_res, out_res,
                                                        2)), jnp.float32),
        "cam_K": jnp.asarray(K),
        "bbox_center": jnp.asarray(rng.uniform(100, 400, (b, 2)),
                                   jnp.float32),
        "resize_ratio": jnp.asarray(rng.uniform(0.2, 0.5, (b,)),
                                    jnp.float32),
        "roi_wh": jnp.asarray(rng.uniform(50, 150, (b, 2)), jnp.float32),
        "mean_size": jnp.asarray(np.tile([[0.1, 0.2, 0.1]], (b, 1)),
                                 jnp.float32),
    }


class TestBackbone:
    def test_convnext_tiny_shape(self, rng):
        model = convnext_tiny()
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (1, 2, 2, 768)   # stride 32
        assert np.isfinite(np.asarray(y)).all()


class TestDwconvLN:
    def test_ln_stats_survive_large_mean_rows(self, rng):
        """Regression: one-pass E[x^2]-mu^2 LN stats cancel catastrophically
        in f32 when |mu| >> sigma (var clamps to ~0 -> rsqrt blowup), which
        silently broke overfit translation learning (08-17).  Pin the
        two-pass formulation against an f64 numpy reference."""
        from givepose_tpu.ops.dwconv_ln import dwconv_ln

        c = 32
        x = (rng.normal(size=(1, 8, 8, c)) * 0.1 + 300.0).astype(np.float32)
        w = np.zeros((7, 7, c), np.float32)
        w[3, 3, :] = 1.0   # identity depthwise kernel
        b = np.zeros((c,), np.float32)
        g = np.ones((c,), np.float32)
        bt = np.zeros((c,), np.float32)
        out = np.asarray(dwconv_ln(jnp.asarray(x), jnp.asarray(w),
                                   jnp.asarray(b), jnp.asarray(g),
                                   jnp.asarray(bt)))
        xf = x.astype(np.float64)
        mu = xf.mean(-1, keepdims=True)
        ref = (xf - mu) / np.sqrt(((xf - mu) ** 2).mean(-1, keepdims=True)
                                  + 1e-6)
        np.testing.assert_allclose(out, ref, atol=5e-3)


class TestHeads:
    def test_xyz_head_upsamples_8x(self, rng):
        head = TopDownXyzHead(feat_dim=32)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 64)), jnp.float32)
        params = head.init(jax.random.PRNGKey(0), x)
        cx, cy, cz = head.apply(params, x)
        assert cx.shape == (2, 32, 32, 1)

    def test_map_encoder_dcn_downsamples_8x(self, rng):
        enc = MAPEncoder(featdim=32, outdim=64)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 4, 4, 64)
        assert np.isfinite(np.asarray(y)).all()

    def test_map_encoder_dcn_window_matches_unwindowed_at_init(self, rng):
        """Zero-init offsets stay inside any window >= 2, so the windowed
        encoder must equal the unwindowed one exactly at init (the
        loss-equivalence argument in ops/dcnv3.py:clamp_to_window)."""
        enc0 = MAPEncoder(featdim=32, outdim=64)
        encw = MAPEncoder(featdim=32, outdim=64, dcn_window=3)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        params = enc0.init(jax.random.PRNGKey(0), x)
        y0 = enc0.apply(params, x)
        yw = encw.apply(params, x)
        np.testing.assert_allclose(np.asarray(yw), np.asarray(y0),
                                   atol=1e-6)

    def test_map_encoder_plain_conv(self, rng):
        enc = MAPEncoder(featdim=32, outdim=64, use_dcn="")
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x)
        assert enc.apply(params, x).shape == (2, 4, 4, 64)

    def test_conv_pnp_net_outputs(self, rng):
        net = ConvPnPNet(featdim=32)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        rot, t, feat = net.apply(params, x)
        assert rot.shape == (2, 6)
        assert t.shape == (2, 3)

    def test_size_head(self, rng):
        head = SizeHead(feat_dim=16)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 32)), jnp.float32)
        variables = head.init(jax.random.PRNGKey(0), x)
        y = head.apply(variables, x)
        assert y.shape == (2, 3)

    def test_dcnv3_zero_init_acts_like_uniform_kernel(self, rng):
        """With zero-init offset/mask the block starts as an unweighted
        local average (softmax of zeros = uniform) — the reference's
        _reset_parameters intent."""
        block = DCNv3(channels=8, group=2)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)), jnp.float32)
        params = block.init(jax.random.PRNGKey(0), x)
        y = block.apply(params, x)
        assert y.shape == (1, 8, 8, 8)
        assert np.isfinite(np.asarray(y)).all()

    def test_map_transformer_encoder(self, rng):
        enc = MAPTransformerEncoder(img_size=16, patch_size=2, embed_dim=32,
                                    depth=1, num_heads=4)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 8, 8, 32)


class TestPoseNet:
    @pytest.fixture
    def tiny_cfg(self):
        return ModelConfig(compute_dtype="float32")

    def test_forward_shapes(self, rng, tiny_cfg):
        model = PoseNet(cfg=tiny_cfg, backbone_variant="tiny")
        batch = make_batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(variables, batch,
                          mutable=["batch_stats"])[0]
        b = 2
        assert out["rot"].shape == (b, 3, 3)
        assert out["trans"].shape == (b, 3)
        assert out["size"].shape == (b, 3)
        assert out["nocs_coor"].shape == (b, 16, 16, 3)
        assert out["ivfc_coor"].shape == (b, 16, 16, 3)
        det = np.linalg.det(np.asarray(out["rot"]))
        np.testing.assert_allclose(det, 1.0, atol=1e-4)

    def test_bf16_compute(self, rng):
        cfg = ModelConfig(compute_dtype="bfloat16")
        model = PoseNet(cfg=cfg, backbone_variant="tiny")
        batch = make_batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(variables, batch, mutable=["batch_stats"])[0]
        # pose outputs must still be f32
        assert out["rot"].dtype == jnp.float32
        assert np.isfinite(np.asarray(out["rot"])).all()

    def test_jit_forward(self, rng, tiny_cfg):
        model = PoseNet(cfg=tiny_cfg, backbone_variant="tiny")
        batch = make_batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch)

        @jax.jit
        def fwd(v, b):
            return model.apply(v, b, mutable=["batch_stats"])[0]

        out = fwd(variables, batch)
        assert np.isfinite(np.asarray(out["trans"])).all()

    def test_dropblock_wiring(self, rng):
        """drop_prob > 0 must activate DropBlock on the MAPEncoder /
        ConvPnPNet inputs at train time (reference conv_pnp_net.py:160-162,
        326-328) and stay inert at eval / rate 0."""
        cfg = ModelConfig(compute_dtype="float32", drop_prob=0.1)
        model = PoseNet(cfg=cfg, backbone_variant="tiny")
        batch = make_batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch)

        def fwd(train, rate, seed=0):
            return model.apply(
                variables, batch, train=train, dropblock_rate=rate,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(seed)})[0]

        base = fwd(False, 0.0)
        dropped = fwd(True, 0.5)
        # train-time: dropblock zeroes patches -> ivfc maps change
        assert not np.allclose(np.asarray(base["ivfc_coor"]),
                               np.asarray(dropped["ivfc_coor"]))
        # eval-time: rate irrelevant, output deterministic
        again = fwd(False, 0.9)
        np.testing.assert_allclose(np.asarray(base["rot_raw"]),
                                   np.asarray(again["rot_raw"]))

    def test_att_encoder_variant(self, rng):
        cfg = ModelConfig(compute_dtype="float32", nocsmap_encoder="att")
        model = PoseNet(cfg=cfg, backbone_variant="tiny")
        batch = make_batch(rng, img=256, out_res=64)
        variables = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(variables, batch, mutable=["batch_stats"])[0]
        assert out["rot"].shape == (2, 3, 3)


class TestScaleNet:
    def test_forward(self, rng):
        model = ScaleNet()
        b = 2
        batch = {
            "roi_img": jnp.asarray(rng.normal(size=(b, 64, 64, 3)),
                                   jnp.float32),
            "full_img": jnp.asarray(rng.normal(size=(b, 64, 64, 3)),
                                    jnp.float32),
            "one_hot": jnp.asarray(np.eye(6)[[0, 3]], jnp.float32),
            "roi_wh": jnp.asarray(rng.uniform(50, 150, (b, 2)), jnp.float32),
            "mean_size": jnp.asarray(np.tile([[0.1, 0.2, 0.1]], (b, 1)),
                                     jnp.float32),
        }
        variables = model.init(jax.random.PRNGKey(0), batch)
        scale = model.apply(variables, batch)
        assert scale.shape == (b,)
        assert np.isfinite(np.asarray(scale)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestAuxModels:
    def test_resnet18_stride32(self, rng):
        from givepose_tpu.models import resnet18
        model = resnet18()
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(variables, x, mutable=["batch_stats"])[0]
        assert y.shape == (1, 2, 2, 512)

    def test_resnet50_channels(self, rng):
        from givepose_tpu.models import resnet50
        model = resnet50()
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(variables, x, mutable=["batch_stats"])[0]
        assert y.shape == (1, 2, 2, 2048)

    def test_coordatt_preserves_shape(self, rng):
        from givepose_tpu.models import CoordAtt
        m = CoordAtt()
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(variables, x)
        assert y.shape == x.shape

    def test_attention_mask_head(self, rng):
        from givepose_tpu.models import AttentionMaskHead
        m = AttentionMaskHead(featdim=32)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(variables, x)
        assert y.shape == (2, 16, 16, 1)
