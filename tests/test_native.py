"""Native host-runtime tests: C++ vs cv2/numpy equivalence."""

import os

import cv2
import numpy as np
import pytest

from givepose_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native lib not built")


class TestPngDecode:
    def test_rgb_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        path = str(tmp_path / "t.png")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        out = nl.decode_png_rgb(path)
        assert out is not None
        np.testing.assert_array_equal(out, img)

    def test_depth16_roundtrip(self, tmp_path, rng):
        depth = rng.integers(0, 5000, (32, 40), dtype=np.uint16)
        path = str(tmp_path / "d.png")
        cv2.imwrite(path, depth)
        out = nl.decode_png_depth(path)
        assert out is not None
        np.testing.assert_array_equal(out, depth)

    def test_composite_depth(self, tmp_path):
        """RGB-composite depth (G*256+B, 32001->0) — reference
        load_depth."""
        h, w = 8, 8
        g = np.full((h, w), 12, np.uint8)
        b = np.full((h, w), 34, np.uint8)
        rgb = np.stack([np.zeros_like(g), g, b], axis=-1)   # RGB
        rgb[0, 0, 1] = 125   # 125*256+B(34) = 32034
        rgb[0, 1, 1] = 125
        rgb[0, 1, 2] = 1     # 32001 -> 0
        path = str(tmp_path / "c.png")
        cv2.imwrite(path, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        out = nl.decode_png_depth(path)
        assert out[1, 1] == 12 * 256 + 34
        assert out[0, 1] == 0
        assert out[0, 0] == 125 * 256 + 34

    def test_missing_file(self):
        assert nl.decode_png_rgb("/nonexistent/x.png") is None


class TestAffineCrop:
    def test_matches_cv2_nearest(self, rng):
        img = rng.uniform(0, 255, (40, 50, 3)).astype(np.float32)
        center, scale, out = (25.3, 19.7), 30.7, 32
        a = out / scale
        m = np.array([[a, 0, out * 0.5 - a * center[0]],
                      [0, a, out * 0.5 - a * center[1]]], np.float32)
        ref = cv2.warpAffine(img, m, (out, out), flags=cv2.INTER_NEAREST)
        got = nl.affine_crop(img, center, scale, out, bilinear=False)
        mismatch = np.mean(np.abs(got - ref) > 1e-4)
        assert mismatch < 0.01

    def test_matches_cv2_bilinear(self, rng):
        img = rng.uniform(0, 255, (40, 50)).astype(np.float32)
        center, scale, out = (25.0, 20.0), 35.0, 48
        a = out / scale
        m = np.array([[a, 0, out * 0.5 - a * center[0]],
                      [0, a, out * 0.5 - a * center[1]]], np.float32)
        ref = cv2.warpAffine(img, m, (out, out), flags=cv2.INTER_LINEAR)
        got = nl.affine_crop(img, center, scale, out, bilinear=True)
        np.testing.assert_allclose(got[2:-2, 2:-2], ref[2:-2, 2:-2],
                                   atol=0.05)

    def test_u8_input(self, rng):
        img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        got = nl.affine_crop(img, (8.0, 8.0), 16.0, 16)
        np.testing.assert_allclose(got, img.astype(np.float32))


class TestMaskBand:
    def test_band_equals_morphology_diff(self):
        mask = np.zeros((32, 32), np.float32)
        mask[8:24, 8:24] = 1.0
        band = nl.mask_band(mask)
        kernel = np.ones((2, 2), np.uint8)
        dil = cv2.dilate(mask, kernel)
        ero = cv2.erode(mask, kernel)
        ref = (dil != ero).astype(np.uint8)
        np.testing.assert_array_equal(band, ref)


class TestPrefetchLoader:
    def test_threaded_decode(self, tmp_path, rng):
        paths = []
        imgs = []
        for i in range(6):
            img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
            p = str(tmp_path / f"{i}.png")
            cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            paths.append(p)
            imgs.append(img)
        loader = nl.PrefetchLoader(paths, max_h=64, max_w=64, n_threads=2)
        # out-of-order access
        for idx in (3, 0, 5, 1, 4, 2):
            out = loader.get(idx)
            np.testing.assert_array_equal(out, imgs[idx])
        loader.close()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
