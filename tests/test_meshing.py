"""Meshing tests: TSDF fusion correctness + marching tetrahedra on
analytic signed-distance fields."""
import numpy as np
import jax.numpy as jnp

from sfm_danpipeline_tpu.mvs.meshing import (
    Mesh,
    fuse_tsdf,
    marching_tetrahedra,
    mesh_from_depth_maps,
)


def _sphere_tsdf(grid=48, radius=0.3):
    ax = np.linspace(-0.5, 0.5, grid)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    d = np.sqrt(gx**2 + gy**2 + gz**2) - radius
    return d.astype(np.float32), ax[1] - ax[0]


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        tsdf, voxel = _sphere_tsdf()
        w = np.ones_like(tsdf)
        mesh = marching_tetrahedra(
            tsdf, w, np.array([-0.5, -0.5, -0.5], np.float32), voxel
        )
        assert len(mesh.vertices) > 500
        assert len(mesh.faces) > 1000
        r = np.linalg.norm(mesh.vertices, axis=1)
        np.testing.assert_allclose(r.mean(), 0.3, atol=0.01)
        assert r.std() < 0.01
        # Faces index valid vertices.
        assert mesh.faces.max() < len(mesh.vertices)
        assert mesh.faces.min() >= 0

    def test_empty_when_no_crossing(self):
        tsdf = np.ones((8, 8, 8), np.float32)
        mesh = marching_tetrahedra(
            tsdf, np.ones_like(tsdf), np.zeros(3, np.float32), 0.1
        )
        assert len(mesh.faces) == 0

    def test_low_weight_excluded(self):
        tsdf, voxel = _sphere_tsdf(grid=24)
        w = np.zeros_like(tsdf)  # nothing observed
        mesh = marching_tetrahedra(
            tsdf, w, np.zeros(3, np.float32), voxel
        )
        assert len(mesh.faces) == 0


class TestTSDF:
    def test_plane_depth_map_fusion(self):
        # One camera at origin looking at plane z=2; TSDF along the ray
        # should cross zero at z=2.
        H, W = 48, 64
        K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
        depth = np.full((1, H, W), 2.0, np.float32)
        zs = np.linspace(1.0, 3.0, 41).astype(np.float32)
        vox = np.stack([np.zeros_like(zs), np.zeros_like(zs), zs], -1)
        tsdf, wgt = fuse_tsdf(
            jnp.asarray(vox),
            jnp.asarray(depth),
            jnp.eye(3, dtype=jnp.float32)[None],
            jnp.zeros((1, 3), jnp.float32),
            jnp.asarray(K),
            jnp.ones(1, bool),
            trunc=0.3,
        )
        tsdf = np.asarray(tsdf)
        wgt = np.asarray(wgt)
        assert (wgt[(zs > 1.1) & (zs < 2.25)] > 0).all()
        # sign: positive in front (z < 2), negative behind (z slightly > 2)
        assert tsdf[zs == 1.9][0] > 0
        assert tsdf[np.isclose(zs, 2.1)][0] < 0
        i0 = np.argmin(np.abs(tsdf[(zs > 1.5) & (zs < 2.5)]))
        z_band = zs[(zs > 1.5) & (zs < 2.5)]
        assert abs(z_band[i0] - 2.0) < 0.06

    def test_end_to_end_plane_mesh(self):
        H, W = 48, 64
        K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
        V = 2
        depth = np.full((V, H, W), 2.0, np.float32)
        R = np.broadcast_to(np.eye(3, dtype=np.float32), (V, 3, 3)).copy()
        t = np.array([[0, 0, 0], [0.1, 0, 0]], np.float32)
        mesh = mesh_from_depth_maps(
            depth, R, t, K, np.ones(V, bool), grid=48
        )
        assert len(mesh.faces) > 100
        np.testing.assert_allclose(mesh.vertices[:, 2].mean(), 2.0, atol=0.05)
