"""Tests for chamfer distance and the separable affine resampler."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from givepose_tpu.ops import (
    chamfer_distances,
    nn_distance,
    crop_resize_affine,
    get_2d_coord_grid,
)
from givepose_tpu.ops.resample import batched_crop_resize


class TestChamfer:
    def test_against_bruteforce(self, rng):
        a = rng.normal(size=(128, 3)).astype(np.float32)
        b = rng.normal(size=(200, 3)).astype(np.float32)
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        da, ia, db, ib = nn_distance(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(da), d2.min(1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(db), d2.min(0), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(ia), d2.argmin(1))
        np.testing.assert_array_equal(np.asarray(ib), d2.argmin(0))

    def test_identical_sets_zero(self, rng):
        a = rng.normal(size=(64, 3)).astype(np.float32)
        loss = chamfer_distances(jnp.asarray(a), jnp.asarray(a))
        assert float(loss) < 1e-5

    def test_masked_padding_ignored(self, rng):
        a = rng.normal(size=(64, 3)).astype(np.float32)
        b = rng.normal(size=(80, 3)).astype(np.float32)
        full = float(chamfer_distances(jnp.asarray(a), jnp.asarray(b)))
        # pad b with garbage and mask it out
        b_pad = np.concatenate([b, np.full((40, 3), 1e6, np.float32)])
        bm = np.concatenate([np.ones(80), np.zeros(40)]).astype(np.float32)
        masked = float(chamfer_distances(jnp.asarray(a), jnp.asarray(b_pad),
                                         b_mask=jnp.asarray(bm)))
        np.testing.assert_allclose(masked, full, rtol=1e-5)

    def test_batched_and_grad(self, rng):
        a = jnp.asarray(rng.normal(size=(4, 64, 3)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(4, 96, 3)), jnp.float32)
        g = jax.grad(lambda x: jnp.sum(chamfer_distances(x, b)))(a)
        assert np.isfinite(np.asarray(g)).all()


class TestAffineResample:
    def _cv2_crop(self, img, center, scale, out, interp):
        # independent oracle: build the same affine from first principles
        # and let cv2 do the warp (reference semantics: get_affine_transform
        # + cv2.warpAffine, dataset_utils.py:101-157)
        a = out / scale
        m = np.array([[a, 0, out * 0.5 - a * center[0]],
                      [0, a, out * 0.5 - a * center[1]]], np.float32)
        return cv2.warpAffine(img, m, (out, out), flags=interp)

    def test_bilinear_matches_cv2(self, rng):
        img = rng.uniform(0, 255, size=(48, 64, 3)).astype(np.float32)
        center, scale, out = (30.0, 25.0), 40.0, 32
        ref = self._cv2_crop(img, center, scale, out, cv2.INTER_LINEAR)
        ours = np.asarray(crop_resize_affine(jnp.asarray(img),
                                             jnp.asarray(center),
                                             scale, out, "bilinear"))
        # interiors must match; cv2 handles border rows slightly
        # differently, so compare where the sample is fully in-bounds
        np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2],
                                   atol=1e-2)

    def test_nearest_matches_cv2(self, rng):
        # center/scale chosen to avoid exact half-pixel sample coordinates
        # (cv2's fixed-point tie-breaking at x.5 is an implementation
        # detail; ties have measure zero on the real jittered-DZI path)
        img = (rng.uniform(0, 255, size=(40, 40)) > 128).astype(np.float32)
        center, scale, out = (20.3, 19.7), 30.7, 64
        ref = self._cv2_crop(img, center, scale, out, cv2.INTER_NEAREST)
        ours = np.asarray(crop_resize_affine(jnp.asarray(img),
                                             jnp.asarray(center),
                                             scale, out, "nearest"))
        mismatch = np.mean(ours != ref)
        assert mismatch < 0.003, f"nearest mismatch ratio {mismatch}"

    def test_identity_crop(self, rng):
        img = rng.normal(size=(32, 32, 2)).astype(np.float32)
        # cv2/CenterNet convention: dst = (src - center)*out/scale + out/2,
        # so the identity crop of a 32-image has center (16,16)
        out = np.asarray(crop_resize_affine(
            jnp.asarray(img), jnp.asarray((16.0, 16.0)), 32.0, 32,
            "bilinear"))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_out_of_bounds_zero(self, rng):
        img = rng.normal(size=(16, 16)).astype(np.float32) + 10.0
        out = np.asarray(crop_resize_affine(
            jnp.asarray(img), jnp.asarray((100.0, 100.0)), 8.0, 8,
            "bilinear"))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_batched_matches_single(self, rng):
        imgs = rng.normal(size=(3, 24, 24, 4)).astype(np.float32)
        centers = rng.uniform(5, 19, size=(3, 2)).astype(np.float32)
        scales = rng.uniform(8, 20, size=(3,)).astype(np.float32)
        batched = np.asarray(batched_crop_resize(
            jnp.asarray(imgs), jnp.asarray(centers), jnp.asarray(scales),
            16, "bilinear"))
        for i in range(3):
            single = np.asarray(crop_resize_affine(
                jnp.asarray(imgs[i]), jnp.asarray(centers[i]),
                float(scales[i]), 16, "bilinear"))
            np.testing.assert_allclose(batched[i], single, atol=1e-5)

    def test_differentiable_through_image(self, rng):
        img = jnp.asarray(rng.normal(size=(16, 16, 1)), jnp.float32)
        g = jax.grad(lambda x: jnp.sum(crop_resize_affine(
            x, jnp.asarray((8.0, 8.0)), 12.0, 8) ** 2))(img)
        assert np.isfinite(np.asarray(g)).all()


class TestCoordGrid:
    def test_matches_reference_formula(self):
        # reference dataset_utils.py:8-30: normalized to [-1,1] by
        # (v - (n-1)/2) / ((n-1)/2)
        grid = np.asarray(get_2d_coord_grid(8, 6))
        assert grid.shape == (2, 6, 8)
        np.testing.assert_allclose(grid[0, 0, 0], -1.0)
        np.testing.assert_allclose(grid[0, 0, -1], 1.0)
        np.testing.assert_allclose(grid[1, 0, 0], -1.0)
        np.testing.assert_allclose(grid[1, -1, 0], 1.0)
        x = np.linspace(0, 7, 8, dtype=np.float32)
        x = (x - 3.5) / 3.5
        np.testing.assert_allclose(grid[0, 2, :], x, atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestPointSample:
    def test_backprojection_and_sampling(self, rng):
        from givepose_tpu.ops.point_sample import depth_to_sampled_pc
        b, h, w = 2, 32, 32
        K = jnp.tile(jnp.array([[100.0, 0, 16], [0, 100.0, 16],
                                [0, 0, 1]]), (b, 1, 1))
        depth = jnp.ones((b, h, w)) * 1.5
        mask = np.zeros((b, h, w), np.float32)
        mask[:, 8:24, 8:24] = 1.0
        pts, valid = depth_to_sampled_pc(jax.random.PRNGKey(0), depth, K,
                                         jnp.asarray(mask), n_sample=128)
        assert pts.shape == (b, 128, 3)
        assert np.all(np.asarray(valid) == 1.0)   # enough valid points
        np.testing.assert_allclose(np.asarray(pts[..., 2]), 1.5)
        # all sampled points back-project inside the mask window
        x = np.asarray(pts[..., 0]) / 1.5 * 100 + 16
        assert x.min() >= 7.5 and x.max() <= 24.5

    def test_insufficient_points_masked(self, rng):
        from givepose_tpu.ops.point_sample import depth_to_sampled_pc
        K = jnp.array([[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]])[None]
        depth = jnp.zeros((1, 16, 16))
        depth = depth.at[0, 5, 5].set(2.0)
        mask = jnp.ones((1, 16, 16))
        pts, valid = depth_to_sampled_pc(jax.random.PRNGKey(0), depth, K,
                                         mask, n_sample=8)
        assert float(valid.sum()) == 1.0
