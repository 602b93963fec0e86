"""I/O layer tests: calibration XML, image loading, PLY/PCD round-trips."""
import os

import numpy as np

from sfm_danpipeline_tpu.io.calibration import load_calibration
from sfm_danpipeline_tpu.io.ply import read_pcd, read_ply, write_pcd, write_ply


def test_calibration_parses_temple_xml(temple_intrinsics):
    # Values from data/temple/camera_calibration_template.xml.
    K = temple_intrinsics.K
    assert K.shape == (3, 3)
    assert np.isclose(K[0, 0], 1520.0)
    assert np.isclose(K[1, 1], 1520.0)
    assert np.isclose(K[0, 2], 302.2)
    assert np.isclose(K[1, 2], 246.87)
    assert np.allclose(temple_intrinsics.dist, 0.0)


def test_load_temple_images(temple_images):
    # 10 images, 640x480, no resize triggered (reference resizes only when
    # larger than 640x480, src/Sfm.cpp:150-160).
    assert temple_images.n_images == 10
    assert temple_images.shape == (480, 640)
    assert temple_images.gray.dtype == np.float32
    assert 0.0 <= temple_images.gray.min() <= temple_images.gray.max() <= 1.0
    assert np.all(temple_images.sizes == [480, 640])
    # Sorted order preserved.
    names = [os.path.basename(p) for p in temple_images.paths]
    assert names == sorted(names)


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    cols = np.random.default_rng(1).integers(0, 255, (50, 3)).astype(np.uint8)
    p = str(tmp_path / "x.ply")
    write_ply(p, pts, cols)
    pts2, cols2 = read_ply(p)
    np.testing.assert_allclose(pts, pts2, rtol=1e-5)
    np.testing.assert_array_equal(cols, cols2)


def test_pcd_roundtrip(tmp_path):
    pts = np.random.default_rng(2).normal(size=(30, 3)).astype(np.float32)
    cols = np.random.default_rng(3).integers(0, 255, (30, 3)).astype(np.uint8)
    p = str(tmp_path / "x.pcd")
    write_pcd(p, pts, cols)
    pts2, cols2 = read_pcd(p)
    np.testing.assert_allclose(pts, pts2, rtol=1e-4)
    np.testing.assert_array_equal(cols, cols2)
