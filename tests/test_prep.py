"""Offline data-prep tests: annotation alignment, shape sampling, AE,
renderer."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from givepose_tpu.prep import (
    align_instance,
    nocs_cube_points,
    normalize_to_nocs,
    render_points,
    sample_surface,
    save_model_points,
    train_shape_prior,
    voxelize,
)


class TestRenderer:
    def test_cube_render_roundtrip(self):
        """Rendered NOCS pixels must back-project onto themselves."""
        pts, colors = nocs_cube_points(48)
        size = np.array([0.12, 0.2, 0.1], np.float32)
        metric = pts * size
        nocs = metric / np.linalg.norm(size)
        R = ScipyRot.from_euler("xyz", [0.4, -0.3, 0.2]
                                ).as_matrix().astype(np.float32)
        t = np.array([0.05, -0.02, 1.0], np.float32)
        K = np.array([[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1]],
                     np.float32)
        img, depth = render_points(jnp.asarray(metric), jnp.asarray(nocs),
                                   jnp.asarray(R), jnp.asarray(t),
                                   jnp.asarray(K))
        img, depth = np.asarray(img), np.asarray(depth)
        ys, xs = np.where(depth > 0)
        assert len(ys) > 500
        sub = slice(0, len(ys), max(1, len(ys) // 300))
        rendered_nocs = img[ys[sub], xs[sub]]
        cam = (rendered_nocs * np.linalg.norm(size)) @ R.T + t
        proj = cam @ K.T
        err = np.hypot(proj[:, 0] / proj[:, 2] - xs[sub],
                       proj[:, 1] / proj[:, 2] - ys[sub])
        assert np.median(err) < 1.5

    def test_zbuffer_keeps_nearest(self):
        pts = np.array([[0, 0, 1.0], [0, 0, 2.0]], np.float32)
        colors = np.array([[1.0], [2.0]], np.float32)
        K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]],
                     np.float32)
        img, depth = render_points(jnp.asarray(pts), jnp.asarray(colors),
                                   jnp.eye(3), jnp.zeros(3),
                                   jnp.asarray(K), im_h=64, im_w=64)
        assert float(img[32, 32, 0]) == 1.0
        np.testing.assert_allclose(float(depth[32, 32]), 1.0)


class TestAnnotation:
    def test_align_recovers_known_pose(self):
        """NOCS->depth alignment must recover the synthetic GT pose."""
        rng = np.random.default_rng(0)
        n = 600
        nocs = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
        scale_mm = 183.0                      # diagonal in mm
        R = ScipyRot.from_euler("xyz", [0.3, 0.5, -0.2]).as_matrix()
        t_mm = np.array([40.0, -30.0, 900.0])
        cam_pts = scale_mm * nocs @ R.T + t_mm
        K = np.array([[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1]])
        proj = cam_pts @ K.T
        xs = np.round(proj[:, 0] / proj[:, 2]).astype(int)
        ys = np.round(proj[:, 1] / proj[:, 2]).astype(int)
        ok = (xs >= 0) & (xs < 640) & (ys >= 0) & (ys < 480)

        depth = np.zeros((480, 640), np.float32)
        mask = np.zeros((480, 640), np.float32)
        nocs_map = np.zeros((480, 640, 3), np.float32)
        depth[ys[ok], xs[ok]] = cam_pts[ok, 2]
        mask[ys[ok], xs[ok]] = 1
        nocs_map[ys[ok], xs[ok]] = nocs[ok]

        fit = align_instance(nocs_map, depth, mask, K,
                             key=jax.random.PRNGKey(1))
        assert fit is not None
        s, rot, t = fit
        np.testing.assert_allclose(s, scale_mm / 1000.0, rtol=0.02)
        from givepose_tpu.geometry import rotation_error_deg
        err = float(rotation_error_deg(jnp.asarray(rot, jnp.float32),
                                       jnp.asarray(R, jnp.float32)))
        assert err < 2.0
        np.testing.assert_allclose(t, t_mm / 1000.0, atol=0.01)


class TestShapeData:
    def test_sample_surface_and_normalize(self, tmp_path):
        # write a simple cube obj
        obj = tmp_path / "models" / "cube.obj"
        os.makedirs(obj.parent)
        verts = [(x, y, z) for x in (0, 2) for y in (0, 1) for z in (0, 1)]
        faces = [(1, 2, 3), (2, 3, 4), (5, 6, 7), (6, 7, 8),
                 (1, 2, 5), (2, 5, 6), (3, 4, 7), (4, 7, 8),
                 (1, 3, 5), (3, 5, 7), (2, 4, 6), (4, 6, 8)]
        with open(obj, "w") as f:
            for v in verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for a, b, c in faces:
                f.write(f"f {a} {b} {c}\n")
        models = save_model_points(str(obj.parent),
                                   str(tmp_path / "out.pkl"),
                                   n_points=256)
        assert "cube" in models
        pts = models["cube"]
        assert pts.shape == (256, 3)
        # normalized: bbox diagonal == 1
        diag = np.linalg.norm(pts.max(0) - pts.min(0))
        np.testing.assert_allclose(diag, 1.0, atol=0.05)
        with open(tmp_path / "out.pkl", "rb") as f:
            assert "cube" in pickle.load(f)

    def test_voxelize(self):
        pts = np.array([[0, 0, 0], [0.49, 0.49, 0.49]], np.float32)
        grid = voxelize(pts, resolution=8)
        assert grid.shape == (8, 8, 8)
        assert grid.sum() == 2
        assert grid[4, 4, 4] == 1 and grid[7, 7, 7] == 1


class TestShapePrior:
    def test_ae_trains_and_mean_shapes(self, rng):
        models = {f"m{i}": rng.uniform(-0.5, 0.5, (128, 3)
                                       ).astype(np.float32)
                  for i in range(6)}
        cats = {f"m{i}": i % 3 for i in range(6)}
        variables, mean_points = train_shape_prior(
            models, cats, n_points=128, emb_dim=64, steps=10,
            batch_size=4, log=lambda *a: None)
        assert mean_points.shape == (6, 128, 3)
        assert np.isfinite(mean_points).all()
        # trained categories are nonzero
        assert np.abs(mean_points[0]).sum() > 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
