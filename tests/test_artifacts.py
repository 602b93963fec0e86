"""Artifact tests: PMVS2-format export, visualization dumps, determinism."""
import os

import numpy as np
import jax.numpy as jnp
import pytest


class TestPMVSExport:
    def test_tree_layout_and_contour_files(self, temple_images,
                                           temple_intrinsics, tmp_path):
        from sfm_danpipeline_tpu.io.pmvs_export import export_pmvs

        V = temple_images.n_images
        R = np.broadcast_to(np.eye(3), (V, 3, 3)).copy()
        t = np.zeros((V, 3))
        t[:, 0] = np.arange(V) * 0.1
        opts = export_pmvs(
            str(tmp_path), temple_images, temple_intrinsics, R, t,
            registered=[0, 1, 2],
        )
        root = os.path.join(str(tmp_path), "denseCloud")
        assert os.path.isdir(os.path.join(root, "visualize"))
        assert os.path.isdir(os.path.join(root, "txt"))
        assert os.path.isdir(os.path.join(root, "models"))
        with open(opts) as f:
            txt = f.read()
        assert "level 1" in txt and "wsize 7" in txt and "CPU 4" in txt
        # CONTOUR projection file: K [R|t] (reference src/Sfm.cpp:1287-1300).
        with open(os.path.join(root, "txt", "0001.txt")) as f:
            lines = f.read().strip().splitlines()
        assert lines[0] == "CONTOUR"
        P = np.array([[float(x) for x in l.split()] for l in lines[1:]])
        expect = temple_intrinsics.K @ np.concatenate(
            [R[1], t[1][:, None]], axis=1
        )
        np.testing.assert_allclose(P, expect, rtol=1e-5)
        assert os.path.exists(os.path.join(root, "visualize", "0000.jpg"))


class TestViz:
    def test_keypoint_and_match_dumps(self, tmp_path):
        from sfm_danpipeline_tpu.utils.viz import (
            draw_keypoints,
            draw_matches,
            save_cloud_views,
            save_depth_map,
        )

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (60, 80)).astype(np.float32)
        xy = rng.uniform([5, 5], [75, 55], (20, 2))
        p1 = str(tmp_path / "kp.png")
        draw_keypoints(p1, img, xy)
        assert os.path.getsize(p1) > 100
        p2 = str(tmp_path / "m.png")
        draw_matches(p2, img, img, xy, xy + 2)
        assert os.path.getsize(p2) > 100
        p3 = str(tmp_path / "d.png")
        depth = np.where(img > 0.3, img * 5, 0).astype(np.float32)
        save_depth_map(p3, depth)
        assert os.path.getsize(p3) > 100
        p4 = str(tmp_path / "cloud.png")
        save_cloud_views(p4, rng.normal(size=(100, 3)),
                         rng.uniform(0, 1, (100, 3)))
        assert os.path.getsize(p4) > 100


class TestDeterminism:
    def test_ransac_deterministic(self, synthetic_scene):
        """Fixed PRNG keys -> bitwise-identical RANSAC results
        (SURVEY.md §5: determinism replaces race detection)."""
        import jax

        from sfm_danpipeline_tpu.ops.epipolar import estimate_relative_pose
        from sfm_danpipeline_tpu.ops.projection import undistort_points

        s = synthetic_scene
        K = jnp.asarray(s["K"], jnp.float32)
        x1 = undistort_points(jnp.asarray(s["obs"][0]), K, jnp.zeros(5))
        x2 = undistort_points(jnp.asarray(s["obs"][1]), K, jnp.zeros(5))
        valid = jnp.ones(x1.shape[0], bool)
        p1 = estimate_relative_pose(jax.random.key(3), x1, x2, valid, focal=800.0)
        p2 = estimate_relative_pose(jax.random.key(3), x1, x2, valid, focal=800.0)
        np.testing.assert_array_equal(np.asarray(p1.R), np.asarray(p2.R))
        np.testing.assert_array_equal(np.asarray(p1.t), np.asarray(p2.t))

    def test_detector_deterministic(self):
        from sfm_danpipeline_tpu.ops.sift import detect_and_compute
        from sfm_danpipeline_tpu.config import FeatureConfig

        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (96, 128)).astype(np.float32)
        cfg = FeatureConfig(max_keypoints=128, n_octaves=2)
        k1 = detect_and_compute(jnp.asarray(img), cfg)
        k2 = detect_and_compute(jnp.asarray(img), cfg)
        np.testing.assert_array_equal(
            np.asarray(k1.descriptors), np.asarray(k2.descriptors)
        )
        np.testing.assert_array_equal(np.asarray(k1.xy), np.asarray(k2.xy))
