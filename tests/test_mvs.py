"""Dense MVS tests: plane-sweep depth on synthetic textured planes with
exact ground truth, homography correctness, fusion consistency logic."""
import numpy as np
import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.mvs.fusion import fuse_view, voxel_downsample
from sfm_danpipeline_tpu.mvs.planesweep import (
    make_depth_hypotheses,
    plane_homography,
    sweep_depth_map,
)


def _texture(h, w, seed=0):
    """Smooth random texture (pure noise defeats bilinear warping)."""
    rng = np.random.default_rng(seed)
    t = rng.normal(size=(h // 4 + 2, w // 4 + 2)).astype(np.float32)
    from scipy import ndimage

    t = ndimage.zoom(t, 4, order=3)[:h, :w]
    t = (t - t.min()) / (np.ptp(t) + 1e-9)
    return t.astype(np.float32)


def _render_plane(K, R, t, tex, tex_K, depth, h, w):
    """Render a textured fronto-parallel plane (z=depth in WORLD frame,
    world cam = identity) into the camera (R, t)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    Kinv = np.linalg.inv(K)
    # Ray through each pixel of camera (R,t): X = R^T (lam * Kinv p - t).
    pix = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T  # cam dirs
    dirs = pix @ R  # world directions (R^T d)
    origin = -R.T @ t
    lam = (depth - origin[2]) / dirs[..., 2]
    Xw = origin + lam[..., None] * dirs
    u = Xw[..., 0] * tex_K + tex.shape[1] / 2
    v = Xw[..., 1] * tex_K + tex.shape[0] / 2
    from scipy import ndimage

    return ndimage.map_coordinates(
        tex, [v.ravel(), u.ravel()], order=1, mode="nearest"
    ).reshape(h, w).astype(np.float32)


class TestPlaneHomography:
    def test_maps_points_exactly(self):
        K = jnp.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        R = jnp.eye(3)
        t = jnp.asarray([0.3, 0.0, 0.0])
        d = 2.0
        H = plane_homography(K, R, t, d)
        # A point on the plane z=d: pick pixel (64, 48) -> ray center.
        X = jnp.asarray([0.0, 0.0, d])
        p_ref = K @ X / d
        p_src = K @ (R @ X + t)
        p_src = p_src / p_src[2]
        mapped = H @ p_ref
        mapped = mapped / mapped[2]
        np.testing.assert_allclose(
            np.asarray(mapped), np.asarray(p_src), atol=1e-4
        )


class TestSweep:
    def test_recovers_plane_depth(self):
        h, w = 96, 128
        K = np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]])
        tex = _texture(512, 512, seed=1)
        tex_K = 60.0
        depth_gt = 3.0
        ref = _render_plane(K, np.eye(3), np.zeros(3), tex, tex_K, depth_gt, h, w)
        R2 = np.eye(3)
        t2 = np.array([0.25, 0.0, 0.0])
        src = _render_plane(K, R2, t2, tex, tex_K, depth_gt, h, w)
        depths = jnp.asarray(np.linspace(1.5, 6.0, 64), jnp.float32)
        dm = sweep_depth_map(
            jnp.asarray(ref),
            jnp.asarray(src)[None],
            jnp.asarray(K, jnp.float32),
            jnp.asarray(R2, jnp.float32)[None],
            jnp.asarray(t2, jnp.float32)[None],
            jnp.ones(1, bool),
            depths,
            min_score=0.7,
        )
        d = np.asarray(dm.depth)
        interior = d[10:-10, 10:-10]
        frac = (interior > 0).mean()
        assert frac > 0.9, f"only {frac:.2f} of pixels confident"
        got = np.median(interior[interior > 0])
        assert abs(got - depth_gt) < 0.1, f"depth {got} vs {depth_gt}"

    def test_two_planes(self):
        """Left half at depth 2, right half at depth 4 -> the sweep must
        recover the step edge."""
        h, w = 96, 128
        K = np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]])
        tex = _texture(512, 512, seed=2)
        near = _render_plane(K, np.eye(3), np.zeros(3), tex, 60.0, 2.0, h, w)
        far = _render_plane(K, np.eye(3), np.zeros(3), tex, 30.0, 4.0, h, w)
        mask = np.zeros((h, w), bool)
        mask[:, : w // 2] = True
        ref = np.where(mask, near, far)
        t2 = np.array([0.2, 0.0, 0.0])
        near2 = _render_plane(K, np.eye(3), t2, tex, 60.0, 2.0, h, w)
        far2 = _render_plane(K, np.eye(3), t2, tex, 30.0, 4.0, h, w)
        # The mask boundary in the source shifts by the disparity difference,
        # but for a median-based check per half it does not matter.
        xs = np.mgrid[0:h, 0:w][1]
        # project world plane split x=0 into source... simpler: composite by
        # per-pixel true depth backprojection is overkill; use ref mask.
        src = np.where(mask, near2, far2)
        depths = jnp.asarray(np.linspace(1.2, 6.0, 96), jnp.float32)
        dm = sweep_depth_map(
            jnp.asarray(ref), jnp.asarray(src)[None],
            jnp.asarray(K, jnp.float32),
            jnp.eye(3, dtype=jnp.float32)[None],
            jnp.asarray(t2, jnp.float32)[None],
            jnp.ones(1, bool), depths, min_score=0.6,
        )
        d = np.asarray(dm.depth)
        left = d[20:-20, 15 : w // 2 - 15]
        right = d[20:-20, w // 2 + 15 : -15]
        assert abs(np.median(left[left > 0]) - 2.0) < 0.15
        assert abs(np.median(right[right > 0]) - 4.0) < 0.25


class TestHypotheses:
    def test_range_covers_samples(self):
        z = jnp.asarray(np.concatenate([np.full(50, -1.0), np.linspace(2, 8, 100)]), jnp.float32)
        d = np.asarray(make_depth_hypotheses(z, 32))
        assert d.min() < 2.5 and d.max() > 7.0
        assert (np.diff(d) > 0).all() or (np.diff(d) < 0).all()


class TestFusion:
    def test_consistent_depths_survive(self):
        # Two identical cameras looking at a plane z=2 with small baseline:
        # depth maps agree -> points survive; a corrupted region dies.
        h, w = 32, 40
        V = 3
        K = jnp.asarray([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]])
        depths = np.full((V, h, w), 2.0, np.float32)
        depths[2, :10, :10] = 0.5  # corrupt view 2 corner
        R = jnp.broadcast_to(jnp.eye(3), (V, 3, 3))
        t = jnp.asarray([[0, 0, 0], [0.05, 0, 0], [-0.05, 0, 0]], jnp.float32)
        # view depths in their own frames: plane z=2 world, cameras at
        # z=0 (identity rotations, x offsets) -> depth 2 everywhere.
        colors = jnp.ones((V, h, w, 3)) * 0.5
        fused = fuse_view(
            jnp.asarray(0),
            jnp.asarray(depths),
            colors,
            R,
            t,
            K,
            jnp.ones(V, bool),
            min_consistent=2,
            depth_consistency=0.02,
        )
        valid = np.asarray(fused.valid).reshape(h, w)
        assert valid[12:-4, 12:-4].mean() > 0.9
        pts = np.asarray(fused.points).reshape(h, w, 3)
        np.testing.assert_allclose(pts[16, 20, 2], 2.0, atol=1e-3)

    def test_voxel_downsample(self):
        pts = np.array([[0, 0, 0], [0.001, 0, 0], [1, 1, 1]], np.float32)
        cols = np.zeros((3, 3), np.float32)
        p2, c2 = voxel_downsample(pts, cols, 0.01)
        assert len(p2) == 2


class TestRectifiedSweep:
    """mvs/rectsweep.py — the TPU-fast rectified form, validated against
    the same ground truth as the direct sweep (and, in
    test_agrees_with_direct_sweep, against the direct sweep itself)."""

    def _pair(self, seed, depth_gt, rot_deg=4.0):
        h, w = 96, 128
        K = np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]])
        tex = _texture(512, 512, seed=seed)
        ref = _render_plane(
            K, np.eye(3), np.zeros(3), tex, 60.0, depth_gt, h, w
        )
        # Source with a small rotation AND translation: rectification must
        # straighten this (pure-translation pairs never exercise it).
        a = np.radians(rot_deg)
        R2 = np.array([
            [np.cos(a), 0, np.sin(a)],
            [0, 1, 0],
            [-np.sin(a), 0, np.cos(a)],
        ])
        t2 = np.array([0.25, 0.03, 0.0])
        src = _render_plane(K, R2, t2, tex, 60.0, depth_gt, h, w)
        return K, ref, src, R2, t2

    def test_recovers_plane_depth_rotated_source(self):
        from sfm_danpipeline_tpu.mvs.rectsweep import rect_sweep_depth_map

        depth_gt = 3.0
        K, ref, src, R2, t2 = self._pair(3, depth_gt)
        dm = rect_sweep_depth_map(
            jnp.asarray(ref),
            jnp.asarray(src)[None],
            jnp.asarray(K, jnp.float32),
            jnp.asarray(R2, jnp.float32)[None],
            jnp.asarray(t2, jnp.float32)[None],
            jnp.ones(1, bool),
            jnp.asarray(1.5, jnp.float32),
            jnp.asarray(6.0, jnp.float32),
            min_score=0.7,
            n_depths=96,
        )
        d = np.asarray(dm.depth)
        interior = d[12:-12, 12:-12]
        frac = (interior > 0).mean()
        assert frac > 0.8, f"only {frac:.2f} of pixels confident"
        got = np.median(interior[interior > 0])
        assert abs(got - depth_gt) < 0.1, f"depth {got} vs {depth_gt}"

    def test_agrees_with_direct_sweep(self):
        """Rectified and direct sweeps are two implementations of the same
        estimator — their confident depths must coincide."""
        from sfm_danpipeline_tpu.mvs.rectsweep import rect_sweep_depth_map

        depth_gt = 2.6
        K, ref, src, R2, t2 = self._pair(5, depth_gt)
        args = (
            jnp.asarray(ref), jnp.asarray(src)[None],
            jnp.asarray(K, jnp.float32),
            jnp.asarray(R2, jnp.float32)[None],
            jnp.asarray(t2, jnp.float32)[None],
            jnp.ones(1, bool),
        )
        dm_r = rect_sweep_depth_map(
            *args, jnp.asarray(1.5, jnp.float32), jnp.asarray(6.0, jnp.float32),
            min_score=0.7, n_depths=96,
        )
        depths = jnp.asarray(np.linspace(1.5, 6.0, 96), jnp.float32)
        dm_d = sweep_depth_map(*args, depths, min_score=0.7)
        a = np.asarray(dm_r.depth)[12:-12, 12:-12]
        b = np.asarray(dm_d.depth)[12:-12, 12:-12]
        both = (a > 0) & (b > 0)
        assert both.mean() > 0.7
        rel = np.abs(a[both] - b[both]) / b[both]
        assert np.median(rel) < 0.02, f"median rel diff {np.median(rel)}"

    def test_multi_source_consensus(self):
        """Three sources around the reference; the consensus must keep the
        plane and the corrupted single-source fallback must stay strict."""
        from sfm_danpipeline_tpu.mvs.rectsweep import rect_sweep_depth_map

        h, w = 96, 128
        K = np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]])
        tex = _texture(512, 512, seed=7)
        depth_gt = 3.2
        ref = _render_plane(K, np.eye(3), np.zeros(3), tex, 60.0, depth_gt, h, w)
        Rs, ts, srcs = [], [], []
        for dx, dy in ((0.25, 0.0), (-0.22, 0.04), (0.1, -0.2)):
            t2 = np.array([dx, dy, 0.0])
            srcs.append(_render_plane(K, np.eye(3), t2, tex, 60.0, depth_gt, h, w))
            Rs.append(np.eye(3))
            ts.append(t2)
        dm = rect_sweep_depth_map(
            jnp.asarray(ref),
            jnp.asarray(np.stack(srcs)),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(np.stack(Rs), jnp.float32),
            jnp.asarray(np.stack(ts), jnp.float32),
            jnp.ones(3, bool),
            jnp.asarray(1.5, jnp.float32),
            jnp.asarray(6.0, jnp.float32),
            min_score=0.7,
            n_depths=96,
        )
        d = np.asarray(dm.depth)
        interior = d[12:-12, 12:-12]
        got = np.median(interior[interior > 0])
        assert abs(got - depth_gt) < 0.1, f"depth {got} vs {depth_gt}"
