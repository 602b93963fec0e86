"""Analysis-tail tests: filtering, segmentation, dendrometry, normals."""
import numpy as np
import jax.numpy as jnp

from sfm_danpipeline_tpu.analysis.dendrometry import estimate
from sfm_danpipeline_tpu.analysis.filtering import (
    neighbor_counts,
    passthrough_mask,
    radius_outlier_mask,
)
from sfm_danpipeline_tpu.analysis.normals import estimate_normals
from sfm_danpipeline_tpu.analysis.segmentation import (
    region_growing_rgb,
    segment_cloud,
)


class TestFiltering:
    def test_passthrough(self):
        pts = jnp.asarray([[0.0, 0, 0], [0.5, 0, 0], [0.9, 0, 0]])
        m = passthrough_mask(pts, "x", 0.003, 0.83)
        assert list(np.asarray(m)) == [False, True, False]

    def test_neighbor_counts_exact(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 1, (300, 3)).astype(np.float32)
        valid = np.ones(300, bool)
        counts = np.asarray(
            neighbor_counts(jnp.asarray(pts), jnp.asarray(valid), 0.2, chunk=64)
        )
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        expect = ((d <= 0.2).sum(1) - 1)
        np.testing.assert_array_equal(counts, expect)

    def test_radius_outlier_removes_isolated(self):
        rng = np.random.default_rng(1)
        cluster = rng.normal(0, 0.02, (200, 3)).astype(np.float32)
        outliers = np.array([[5, 5, 5], [-5, 5, 0]], np.float32)
        pts = jnp.asarray(np.vstack([cluster, outliers]))
        m = radius_outlier_mask(pts, jnp.ones(202, bool), radius=0.1,
                                min_neighbors=10)
        m = np.asarray(m)
        assert m[:200].all()
        assert not m[200:].any()


class TestSegmentation:
    def test_two_color_clusters(self):
        rng = np.random.default_rng(2)
        a = rng.normal(0, 0.5, (400, 3)).astype(np.float32)
        b = rng.normal(0, 0.5, (400, 3)).astype(np.float32) + [4, 0, 0]
        pts = jnp.asarray(np.vstack([a, b]))
        cols = np.zeros((800, 3), np.float32)
        cols[:400] = [1.0, 0.0, 0.0]
        cols[400:] = [0.0, 1.0, 0.0]
        res = region_growing_rgb(
            pts, jnp.asarray(cols) * 255.0, jnp.ones(800, bool),
            distance=1.0, point_color=6.0, region_color=5.0, min_cluster=100,
        )
        assert int(res.n_clusters) == 2
        lab = np.asarray(res.labels)
        # Isolated stragglers (no kNN edge within `distance`) may drop to -1.
        a_lab = lab[:400][lab[:400] >= 0]
        b_lab = lab[400:][lab[400:] >= 0]
        assert len(a_lab) >= 395 and len(b_lab) >= 395
        assert (a_lab == a_lab[0]).all()
        assert (b_lab == b_lab[0]).all()
        assert a_lab[0] != b_lab[0]

    def test_small_clusters_dropped(self):
        rng = np.random.default_rng(3)
        big = rng.normal(0, 0.3, (500, 3)).astype(np.float32)
        tiny = rng.normal(0, 0.05, (20, 3)).astype(np.float32) + [8, 0, 0]
        pts = jnp.asarray(np.vstack([big, tiny]))
        cols = jnp.ones((520, 3)) * 128.0
        res = region_growing_rgb(
            pts, cols, jnp.ones(520, bool),
            distance=1.0, min_cluster=100,
        )
        lab = np.asarray(res.labels)
        assert int(res.n_clusters) == 1
        assert (lab[500:] == -1).all()

    def test_z_passthrough(self):
        pts = np.zeros((300, 3), np.float32)
        pts[:, 2] = np.linspace(-5, 20, 300)
        pts[:, 0] = np.random.default_rng(4).normal(0, 0.1, 300)
        res = segment_cloud(
            jnp.asarray(pts), jnp.ones((300, 3)) * 0.5,
            jnp.ones(300, bool), z_min=0.0, z_max=14.0,
            distance=1.0, min_cluster=10,
        )
        lab = np.asarray(res.labels)
        z = pts[:, 2]
        assert (lab[(z < 0) | (z > 14)] == -1).all()


class TestDendrometry:
    def test_known_box(self):
        pts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 2, 0], [0, 0, 3], [1, 2, 3]],
            np.float32,
        )
        rep = estimate(jnp.asarray(pts), jnp.ones(5, bool))
        np.testing.assert_allclose(
            rep["total_height"], np.sqrt(1 + 4 + 9), rtol=1e-5
        )
        assert rep["axis_height"] == 3.0  # z extent is largest
        assert rep["n_points"] == 5

    def test_mask_respected(self):
        pts = np.array([[0, 0, 0], [0, 0, 100]], np.float32)
        rep = estimate(jnp.asarray(pts), jnp.asarray([True, False]))
        assert rep["total_height"] == 0.0


class TestNormals:
    def test_plane_normals(self):
        rng = np.random.default_rng(5)
        xy = rng.uniform(-1, 1, (500, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.full((500, 1), 2.0, np.float32)], -1)
        n = np.asarray(
            estimate_normals(jnp.asarray(pts), jnp.ones(500, bool),
                             viewpoint=jnp.zeros(3))
        )
        # Normal of the z=2 plane is +-z; flipped toward origin -> -z.
        # (power iteration converges slowly on near-collinear neighborhoods,
        # so allow a small slow tail)
        assert (np.abs(n[:, 2]) > 0.99).mean() > 0.97
        assert (np.abs(n[:, 2]) > 0.9).all()
        assert (n[:, 2] < 0).all()
