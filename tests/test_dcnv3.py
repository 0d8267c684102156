"""DCNv3 numerical equivalence tests.

Mirrors the strategy of reference ops_dcnv3/test.py (CUDA vs pytorch
equivalence + gradcheck) but with an independent torch oracle: sampling
grids are derived from first principles and evaluated with
torch.nn.functional.grid_sample, which is the reference's own ground-truth
primitive.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from givepose_tpu.ops import dcnv3_core


def torch_dcnv3_oracle(x, offset, mask, kernel, stride, pad, dilation,
                       group, offset_scale):
    """Independent NHWC DCNv3 evaluation via torch grid_sample.

    Builds normalized sampling grids directly from the published DCNv3
    definition: for output pixel (i,j), tap (a,b), group g the sample point
    in padded-pixel space is
        center + dilation_offset*scale + learned_offset*scale
    then normalized to [-1,1] for align_corners=False grid_sample.
    """
    n, h, w, c_total = x.shape
    gc = c_total // group
    p = kernel * kernel
    x_pad = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h_in, w_in = h + 2 * pad, w + 2 * pad
    h_out = (h_in - (dilation * (kernel - 1) + 1)) // stride + 1
    w_out = (w_in - (dilation * (kernel - 1) + 1)) // stride + 1

    half = (dilation * (kernel - 1)) // 2
    ref_y = half + 0.5 + stride * np.arange(h_out)
    ref_x = half + 0.5 + stride * np.arange(w_out)
    lin = np.linspace(-half, -half + (kernel - 1) * dilation, kernel)
    gx = np.repeat(lin, kernel)
    gy = np.tile(lin, kernel)

    off = offset.reshape(n, h_out, w_out, group, p, 2)
    sx = (ref_x[None, None, :, None, None]
          + gx[None, None, None, None, :] * offset_scale
          + off[..., 0] * offset_scale)
    sy = (ref_y[None, :, None, None, None]
          + gy[None, None, None, None, :] * offset_scale
          + off[..., 1] * offset_scale)
    # to align_corners=False normalized coords
    nx = 2 * sx / w_in - 1
    ny = 2 * sy / h_in - 1

    # (N*G, C, H_in, W_in)
    xt = torch.from_numpy(
        x_pad.reshape(n, h_in, w_in, group, gc)
        .transpose(0, 3, 4, 1, 2).reshape(n * group, gc, h_in, w_in))
    grid = torch.from_numpy(
        np.stack([nx, ny], axis=-1)
        .transpose(0, 3, 1, 2, 4, 5)
        .reshape(n * group, h_out * w_out, p, 2))
    samp = F.grid_sample(xt, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=False)     # (N*G, C, HW, P)
    m = torch.from_numpy(
        mask.reshape(n, h_out, w_out, group, p)
        .transpose(0, 3, 1, 2, 4).reshape(n * group, 1,
                                          h_out * w_out, p))
    out = (samp * m).sum(-1)                      # (N*G, C, HW)
    out = (out.reshape(n, group, gc, h_out, w_out)
           .permute(0, 3, 4, 1, 2).reshape(n, h_out, w_out, group * gc))
    return out.numpy()


def make_inputs(rng, n=2, h=12, w=10, group=4, gc=8, kernel=3, stride=2,
                dilation=1, offset_std=2.0):
    pad = (kernel - 1) // 2
    h_in, w_in = h + 2 * pad, w + 2 * pad
    eff_k = dilation * (kernel - 1) + 1
    h_out = (h_in - eff_k) // stride + 1
    w_out = (w_in - eff_k) // stride + 1
    p = kernel * kernel
    x = rng.normal(size=(n, h, w, group * gc)).astype(np.float64)
    offset = (rng.normal(size=(n, h_out, w_out, group * p * 2))
              * offset_std).astype(np.float64)
    logits = rng.normal(size=(n, h_out, w_out, group, p))
    mask = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    mask = mask.reshape(n, h_out, w_out, group * p).astype(np.float64)
    return x, offset, mask


class TestDCNv3Core:
    @pytest.mark.parametrize("stride", [1, 2])
    @pytest.mark.parametrize("dilation", [1, 2])
    def test_matches_grid_sample_oracle(self, rng, stride, dilation):
        kernel, group, gc = 3, 4, 8
        pad = 1
        x, offset, mask = make_inputs(rng, stride=stride, dilation=dilation)
        ref = torch_dcnv3_oracle(x, offset, mask, kernel, stride, pad,
                                 dilation, group, 1.0)
        # float32 path (jax default) — mirrors reference
        # check_forward_equal_with_pytorch_float, but much tighter than its
        # rtol=1e-2/atol=1e-3
        ours = np.asarray(dcnv3_core(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            kernel=kernel, stride=stride, pad=pad, dilation=dilation,
            group=group, offset_scale=1.0))
        np.testing.assert_allclose(ours, ref, atol=1e-5)
        # float64 path — mirrors check_forward_equal_with_pytorch_double
        jax.config.update("jax_enable_x64", True)
        try:
            ours64 = np.asarray(dcnv3_core(
                jnp.asarray(x, jnp.float64), jnp.asarray(offset, jnp.float64),
                jnp.asarray(mask, jnp.float64),
                kernel=kernel, stride=stride, pad=pad, dilation=dilation,
                group=group, offset_scale=1.0))
        finally:
            jax.config.update("jax_enable_x64", False)
        np.testing.assert_allclose(ours64, ref, atol=1e-12)

    def test_zero_offset_is_regular_sampling(self, rng):
        """With zero offsets and a delta mask on the center tap, stride-1
        DCNv3 must return the input itself."""
        n, h, w, group, gc = 1, 8, 8, 2, 4
        kernel, p = 3, 9
        x = rng.normal(size=(n, h, w, group * gc)).astype(np.float32)
        offset = np.zeros((n, h, w, group * p * 2), np.float32)
        mask = np.zeros((n, h, w, group, p), np.float32)
        mask[..., 4] = 1.0  # center tap of a 3x3 kernel
        out = np.asarray(dcnv3_core(
            jnp.asarray(x), jnp.asarray(offset),
            jnp.asarray(mask.reshape(n, h, w, -1)),
            kernel=3, stride=1, pad=1, group=group))
        np.testing.assert_allclose(out, x, atol=1e-5)

    def test_out_of_bounds_zero_padding(self, rng):
        """Huge offsets push all taps out of bounds -> output must be 0."""
        x, offset, mask = make_inputs(rng)
        offset = offset * 0 + 1000.0
        out = np.asarray(dcnv3_core(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            kernel=3, stride=2, pad=1, group=4))
        np.testing.assert_allclose(out, 0.0, atol=1e-12)

    def test_gradients_match_torch(self, rng):
        """Gradcheck analogue of reference ops_dcnv3/test.py backward tests:
        compare jax grads to torch autograd through the oracle."""
        kernel, stride, pad, dilation, group, gc = 3, 2, 1, 1, 2, 4
        n, h, w = 1, 6, 6
        p = kernel * kernel
        h_out = w_out = (h + 2 * pad - kernel) // stride + 1
        x = rng.normal(size=(n, h, w, group * gc))
        offset = rng.normal(size=(n, h_out, w_out, group * p * 2)) * 1.5
        logits = rng.normal(size=(n, h_out, w_out, group, p))
        mask = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
                ).reshape(n, h_out, w_out, -1)

        def loss_jax(x_, o_, m_):
            out = dcnv3_core(x_, o_, m_, kernel=kernel, stride=stride,
                             pad=pad, dilation=dilation, group=group)
            return jnp.sum(out ** 2)

        gx, go, gm = jax.grad(loss_jax, argnums=(0, 1, 2))(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask))

        # torch side: re-express the oracle differentiably
        xt = torch.tensor(x, requires_grad=True)
        ot = torch.tensor(offset, requires_grad=True)
        mt = torch.tensor(mask, requires_grad=True)

        def torch_fwd(xt, ot, mt):
            x_pad = F.pad(xt.permute(0, 3, 1, 2),
                          (pad, pad, pad, pad)).permute(0, 2, 3, 1)
            h_in, w_in = h + 2 * pad, w + 2 * pad
            half = (dilation * (kernel - 1)) // 2
            ref_y = torch.tensor(
                half + 0.5 + stride * np.arange(h_out), dtype=xt.dtype)
            ref_x = torch.tensor(
                half + 0.5 + stride * np.arange(w_out), dtype=xt.dtype)
            lin = np.linspace(-half, -half + (kernel - 1) * dilation, kernel)
            gxk = torch.tensor(np.repeat(lin, kernel), dtype=xt.dtype)
            gyk = torch.tensor(np.tile(lin, kernel), dtype=xt.dtype)
            off = ot.reshape(n, h_out, w_out, group, p, 2)
            sx = (ref_x[None, None, :, None, None]
                  + gxk[None, None, None, None, :] + off[..., 0])
            sy = (ref_y[None, :, None, None, None]
                  + gyk[None, None, None, None, :] + off[..., 1])
            nx = 2 * sx / w_in - 1
            ny = 2 * sy / h_in - 1
            xg = (x_pad.reshape(n, h_in, w_in, group, gc)
                  .permute(0, 3, 4, 1, 2)
                  .reshape(n * group, gc, h_in, w_in))
            grid = torch.stack([nx, ny], dim=-1).permute(
                0, 3, 1, 2, 4, 5).reshape(n * group, h_out * w_out, p, 2)
            samp = F.grid_sample(xg, grid, mode="bilinear",
                                 padding_mode="zeros", align_corners=False)
            mm = (mt.reshape(n, h_out, w_out, group, p)
                  .permute(0, 3, 1, 2, 4)
                  .reshape(n * group, 1, h_out * w_out, p))
            out = (samp * mm).sum(-1)
            return (out ** 2).sum()

        torch_fwd(xt, ot, mt).backward()
        # jax grads are f32 (x64 off) vs torch f64 — 1e-5 is the f32 floor
        np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(go), ot.grad.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gm), mt.grad.numpy(),
                                   atol=1e-5)

    def test_jit_and_vmap(self, rng):
        x, offset, mask = make_inputs(rng, n=3)
        fn = jax.jit(lambda a, b, c: dcnv3_core(a, b, c, kernel=3, stride=2,
                                                pad=1, group=4))
        out = fn(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask))
        assert np.isfinite(np.asarray(out)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestDCNv3Pallas:
    """Pallas kernel vs jnp core (interpret mode on CPU) — mirrors the
    reference's CUDA-vs-pytorch equivalence suite (ops_dcnv3/test.py)."""

    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_core(self, rng, stride):
        from givepose_tpu.ops.dcnv3_pallas import dcnv3_pallas
        g, gc, p, pad = 4, 8, 9, 1
        h = w = 16
        h_out = (h + 2 * pad - 3) // stride + 1
        x = rng.normal(size=(2, h, w, g * gc)).astype(np.float32)
        off = (rng.normal(size=(2, h_out, h_out, g * p * 2)) * 2
               ).astype(np.float32)
        logits = rng.normal(size=(2, h_out, h_out, g, p))
        m = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
             ).reshape(2, h_out, h_out, -1).astype(np.float32)
        ref = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(off),
                                    jnp.asarray(m), stride=stride, group=g))
        out = np.asarray(dcnv3_pallas(jnp.asarray(x), jnp.asarray(off),
                                      jnp.asarray(m), stride=stride,
                                      group=g, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_fast_grad_uses_core_vjp(self, rng):
        from givepose_tpu.ops.dcnv3_pallas import dcnv3_fast
        g, gc, p, pad, stride = 2, 4, 9, 1, 2
        h = w = 8
        h_out = (h + 2 * pad - 3) // stride + 1
        x = jnp.asarray(rng.normal(size=(1, h, w, g * gc)), jnp.float32)
        off = jnp.asarray(rng.normal(size=(1, h_out, h_out, g * p * 2)),
                          jnp.float32)
        logits = rng.normal(size=(1, h_out, h_out, g, p))
        m = jnp.asarray((np.exp(logits) / np.exp(logits).sum(-1,
                                                             keepdims=True)
                         ).reshape(1, h_out, h_out, -1), jnp.float32)

        # on CPU the pallas fwd runs via interpret-incompatible compiled
        # path; only check the vjp wiring produces finite core grads
        def loss(x_, o_, m_):
            return jnp.sum(dcnv3_core(x_, o_, m_, stride=stride,
                                      group=g) ** 2)

        gx = jax.grad(loss)(x, off, m)
        assert np.isfinite(np.asarray(gx)).all()


class TestDCNv3PallasBf16:
    def test_bf16_mode_close_to_core(self, rng):
        from givepose_tpu.ops.dcnv3_pallas import dcnv3_pallas
        g, p, stride = 4, 9, 2
        h = 16
        c = 64
        h_out = (h + 2 - 3) // stride + 1
        x = rng.normal(size=(2, h, h, c)).astype(np.float32)
        off = (rng.normal(size=(2, h_out, h_out, g * p * 2)) * 2
               ).astype(np.float32)
        logits = rng.normal(size=(2, h_out, h_out, g, p))
        m = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
             ).reshape(2, h_out, h_out, -1).astype(np.float32)
        ref = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(off),
                                    jnp.asarray(m), stride=stride,
                                    group=g))
        out = np.asarray(dcnv3_pallas(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(m),
            stride=stride, group=g, interpret=True,
            compute_dtype=jnp.bfloat16))
        # bf16 stage compute: ~1e-2 absolute on unit-scale activations
        assert np.abs(out - ref).max() < 0.05
        assert np.abs(out - ref).mean() < 0.005


class TestDCNv3PallasBackward:
    def test_bwd_kernel_matches_core_autodiff(self, rng):
        """Interpret-mode backward kernel grads == XLA core autodiff
        (analogue of the reference's CUDA backward gradcheck)."""
        from givepose_tpu.ops.dcnv3_pallas import (_prepare_inputs,
                                                   auto_tiles)
        from givepose_tpu.ops.dcnv3_pallas_bwd import dcnv3_pallas_bwd

        n, h, c, g, stride, p, pad = 2, 12, 32, 4, 2, 9, 1
        ho = (h + 2 * pad - 3) // stride + 1
        x = rng.normal(size=(n, h, h, c)).astype(np.float32)
        off = (rng.normal(size=(n, ho, ho, g * p * 2)) * 1.5
               ).astype(np.float32)
        logits = rng.normal(size=(n, ho, ho, g, p))
        m = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
             ).reshape(n, ho, ho, -1).astype(np.float32)
        gup = rng.normal(size=(n, ho, ho, c)).astype(np.float32)

        def loss_core(a, b, c_):
            return jnp.sum(dcnv3_core(a, b, c_, stride=stride,
                                      group=g) * gup)

        refs = jax.grad(loss_core, argnums=(0, 1, 2))(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(m))

        tap_chunk, ptm = auto_tiles(x.shape, off.shape, 3, pad, g,
                                    jnp.float32, 6 << 20)

        def prep(a, b, c_):
            img_t, aux, _ = _prepare_inputs(a, b, c_, 3, stride, pad, 1,
                                            g, 1.0, pix_tile_max=ptm)
            return img_t, aux

        (img_t, aux), vjp_prep = jax.vjp(prep, jnp.asarray(x),
                                         jnp.asarray(off), jnp.asarray(m))
        _, _, dims = _prepare_inputs(jnp.asarray(x), jnp.asarray(off),
                                     jnp.asarray(m), 3, stride, pad, 1, g,
                                     1.0, pix_tile_max=ptm)
        gc = dims["gc"]
        q_pix = dims["q_pix"]
        q_pad = dims["n_tiles"] * dims["pix_tile"]
        gk = jnp.asarray(gup).reshape(n, q_pix, g, gc).transpose(0, 2, 3,
                                                                 1)
        gk = jnp.pad(gk, ((0, 0), (0, 0), (0, 0), (0, q_pad - q_pix)))
        d_img_t, d_aux = dcnv3_pallas_bwd(img_t, aux, gk, dims,
                                          tap_chunk=tap_chunk,
                                          interpret=True)
        outs = vjp_prep((d_img_t, d_aux))
        for got, ref in zip(outs, refs):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5)


class TestDCNv3Windowed:
    """Windowed kernel (ops/dcnv3_window_pallas.py) vs the clamped XLA
    core — the static-window redesign of the reference's unbounded
    sampling (dcnv3_im2col_cuda.cuh:217)."""

    def _inputs(self, rng, h, c, g, stride, off_scale=2.0, n=2):
        p, pad = 9, 1
        h_out = (h + 2 * pad - 3) // stride + 1
        x = rng.normal(size=(n, h, h, c)).astype(np.float32)
        off = (rng.normal(size=(n, h_out, h_out, g * p * 2)) * off_scale
               ).astype(np.float32)
        logits = rng.normal(size=(n, h_out, h_out, g, p))
        m = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
             ).reshape(n, h_out, h_out, -1).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(off), jnp.asarray(m)

    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_clamped_core(self, rng, stride):
        from givepose_tpu.ops.dcnv3_window_pallas import (
            dcnv3_windowed_pallas)
        g = 4
        x, off, m = self._inputs(rng, 16, 32, g, stride)
        ref = np.asarray(dcnv3_core(x, off, m, stride=stride, group=g,
                                    window=3))
        out = np.asarray(dcnv3_windowed_pallas(
            x, off, m, stride=stride, group=g, window=3, interpret=True,
            compute_dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_noop_for_in_window_offsets(self, rng):
        """Offsets comfortably inside the window: clamped == reference
        semantics exactly (the loss-equivalence argument for enabling the
        window on zero-init models)."""
        g, stride = 4, 2
        x, off, m = self._inputs(rng, 16, 32, g, stride, off_scale=0.4)
        ref = np.asarray(dcnv3_core(x, off, m, stride=stride, group=g))
        clamped = np.asarray(dcnv3_core(x, off, m, stride=stride, group=g,
                                        window=3))
        np.testing.assert_allclose(clamped, ref, atol=1e-6)

    def test_bf16_mode_close_to_clamped_core(self, rng):
        from givepose_tpu.ops.dcnv3_window_pallas import (
            dcnv3_windowed_pallas)
        g, stride = 4, 2
        x, off, m = self._inputs(rng, 16, 64, g, stride)
        ref = np.asarray(dcnv3_core(x, off, m, stride=stride, group=g,
                                    window=3))
        out = np.asarray(dcnv3_windowed_pallas(
            x, off, m, stride=stride, group=g, window=3, interpret=True,
            compute_dtype=jnp.bfloat16))
        assert np.abs(out - ref).max() < 0.05
        assert np.abs(out - ref).mean() < 0.005

    def test_tile_geometry_odd_height(self, rng):
        """h_out not divisible by the row-tile: padded queries must not
        corrupt real ones."""
        from givepose_tpu.ops.dcnv3_window_pallas import (
            dcnv3_windowed_pallas)
        g, stride = 2, 1
        p, pad = 9, 1
        h, w = 11, 16   # h_out = 11, w_out = 16 -> TR=8, tiles=2, pad=5
        x = jnp.asarray(rng.normal(size=(1, h, w, g * 16)), jnp.float32)
        off = jnp.asarray(rng.normal(size=(1, h, w, g * p * 2)) * 2,
                          jnp.float32)
        logits = rng.normal(size=(1, h, w, g, p))
        m = jnp.asarray((np.exp(logits)
                         / np.exp(logits).sum(-1, keepdims=True)
                         ).reshape(1, h, w, -1), jnp.float32)
        ref = np.asarray(dcnv3_core(x, off, m, stride=stride, group=g,
                                    window=3))
        out = np.asarray(dcnv3_windowed_pallas(
            x, off, m, stride=stride, group=g, window=3, interpret=True,
            compute_dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_backward_matches_clamped_core_autodiff(self, rng):
        """The windowed custom-vjp backward (unwindowed bwd kernel on
        clamped locations) == autodiff of the clamped core."""
        from givepose_tpu.ops.dcnv3_pallas import (_prepare_inputs,
                                                   _static_dims, auto_tiles)
        from givepose_tpu.ops.dcnv3_pallas_bwd import dcnv3_pallas_bwd
        g, stride, window = 2, 2, 3
        x, off, m = self._inputs(rng, 8, 8, g, stride, n=1)
        gc = x.shape[-1] // g

        def loss(a, b, c):
            return jnp.sum(dcnv3_core(a, b, c, stride=stride, group=g,
                                      window=window) ** 2)

        refs = jax.grad(loss, argnums=(0, 1, 2))(x, off, m)

        out = dcnv3_core(x, off, m, stride=stride, group=g, window=window)
        gup = 2.0 * out
        tap_chunk, ptm = auto_tiles(x.shape, off.shape, 3, 1, g,
                                    jnp.float32, 6 * 1024 * 1024)

        def prep(a, b, c):
            img_t, aux, _ = _prepare_inputs(
                a, b, c, 3, stride, 1, 1, g, 1.0, pix_tile_max=ptm,
                k_major=False, k_align=128, window=window)
            return img_t, aux

        (img_t, aux), vjp_prep = jax.vjp(prep, x, off, m)
        dims = _static_dims(x.shape, off.shape, 3, 1, g, pix_tile_max=ptm,
                            k_align=128)
        q_pad = dims["n_tiles"] * dims["pix_tile"]
        gk = (gup.reshape(1, dims["q_pix"], g, gc).transpose(0, 2, 3, 1))
        gk = jnp.pad(gk, ((0, 0), (0, 0), (0, 0),
                          (0, q_pad - dims["q_pix"])))
        d_img_t, d_aux = dcnv3_pallas_bwd(img_t, aux, gk, dims,
                                          tap_chunk=tap_chunk,
                                          interpret=True)
        outs = vjp_prep((d_img_t, d_aux))
        for got, ref in zip(outs, refs):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5)
