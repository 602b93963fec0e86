"""Native runtime tests: C++ lib builds, binds, and agrees with the
Python fallbacks."""
import numpy as np
import pytest

from sfm_danpipeline_tpu.io import native


def test_native_library_builds():
    assert native.available(), "native/libcloudio.so must build via make"


def test_binary_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (1000, 3)).astype(np.uint8)
    p = str(tmp_path / "x.ply")
    native.write_ply_fast(p, pts, cols)
    pts2, cols2 = native.read_ply_fast(p)
    np.testing.assert_allclose(pts, pts2, rtol=1e-6)
    np.testing.assert_array_equal(cols, cols2)


def test_binary_ply_no_color(tmp_path):
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    p = str(tmp_path / "nc.ply")
    native.write_ply_fast(p, pts)
    pts2, _ = native.read_ply_fast(p)
    np.testing.assert_allclose(pts, pts2, rtol=1e-6)


def test_voxel_downsample_matches_numpy():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    idx = native.voxel_downsample_fast(pts, 0.1)
    # One representative per occupied voxel.
    keys = np.floor(pts[idx] / 0.1).astype(np.int64)
    assert len(np.unique(keys, axis=0)) == len(idx)
    all_keys = np.floor(pts / 0.1).astype(np.int64)
    assert len(np.unique(all_keys, axis=0)) == len(idx)


def test_radius_counts_match_bruteforce():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 1, (800, 3)).astype(np.float32)
    counts = native.radius_neighbor_counts_fast(pts, 0.15)
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    expect = ((d <= 0.15).sum(1) - 1).astype(np.int32)
    np.testing.assert_array_equal(counts, expect)


def test_radius_counts_scale():
    """Grid acceleration handles a large cloud quickly (no O(N^2) blowup)."""
    import time

    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 10, (200_000, 3)).astype(np.float32)
    t0 = time.time()
    counts = native.radius_neighbor_counts_fast(pts, 0.05)
    dt = time.time() - t0
    assert dt < 10.0, f"took {dt:.1f}s"
    assert counts.shape == (200_000,)
