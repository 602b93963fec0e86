"""Geometry kernel tests against exact synthetic ground truth
(SURVEY.md §4: synthetic cameras with known R, t -> triangulation / PnP /
essential recover exactly)."""
import numpy as np
import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.ops.epipolar import (
    decompose_essential,
    estimate_relative_pose,
    sampson_distance,
)
from sfm_danpipeline_tpu.ops.homography import homography_ransac, transfer_error
from sfm_danpipeline_tpu.ops.lie import exp_so3, log_so3, rotate_point
from sfm_danpipeline_tpu.ops.pnp import solve_pnp_ransac
from sfm_danpipeline_tpu.ops.projection import project, undistort_points
from sfm_danpipeline_tpu.ops.triangulation import (
    pose_matrix,
    triangulate_and_filter,
    triangulate_dlt,
)


def _normalize(px, K):
    return undistort_points(jnp.asarray(px), jnp.asarray(K), jnp.zeros(5))


def _relpose(scene, i, j):
    """Ground-truth relative pose j<-i."""
    Ri, ti = scene["R"][i], scene["t"][i]
    Rj, tj = scene["R"][j], scene["t"][j]
    R = Rj @ Ri.T
    t = tj - R @ ti
    return R, t


class TestLie:
    def test_exp_log_roundtrip(self):
        # log returns the principal value, so the roundtrip holds for
        # ||w|| < pi only (all rotations this pipeline optimizes).
        rng = np.random.default_rng(0)
        w = rng.normal(size=(20, 3))
        w = w / np.linalg.norm(w, axis=1, keepdims=True)
        w = w * rng.uniform(1e-4, 3.0, (20, 1))
        R = exp_so3(jnp.asarray(w))
        w2 = log_so3(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-5)

    def test_exp_near_zero(self):
        w = jnp.asarray([1e-9, -1e-9, 0.0])
        R = exp_so3(w)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        # Gradient is finite at zero.
        g = jax.grad(lambda w: jnp.sum(exp_so3(w)))(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()

    def test_rotate_point_matches_matrix(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=3))
        p = jnp.asarray(rng.normal(size=(5, 3)))
        R = exp_so3(w)
        np.testing.assert_allclose(
            np.asarray(rotate_point(w[None], p)),
            np.asarray(p @ R.T),
            atol=1e-5,
        )


class TestProjection:
    def test_project_matches_synthetic_obs(self, synthetic_scene):
        s = synthetic_scene
        px = project(
            jnp.asarray(s["points"]),
            jnp.asarray(s["R"][2]),
            jnp.asarray(s["t"][2]),
            jnp.asarray(s["K"]),
        )
        np.testing.assert_allclose(np.asarray(px), s["obs"][2], atol=1e-3)

    def test_undistort_inverts_projection(self, synthetic_scene):
        s = synthetic_scene
        xn = _normalize(s["obs"][0], s["K"])
        cam = s["points"] @ s["R"][0].T + s["t"][0]
        expected = cam[:, :2] / cam[:, 2:3]
        np.testing.assert_allclose(np.asarray(xn), expected, atol=1e-5)

    def test_undistort_with_distortion(self):
        # Distort a known normalized point, then undo it.
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        dist = np.array([0.1, -0.05, 0.001, 0.002, 0.01])
        xn = np.array([[0.2, -0.1], [0.05, 0.3]])
        r2 = (xn**2).sum(-1, keepdims=True)
        radial = 1 + 0.1 * r2 - 0.05 * r2**2 + 0.01 * r2**3
        x, y = xn[:, :1], xn[:, 1:]
        dx = 2 * 0.001 * x * y + 0.002 * (r2 + 2 * x * x)
        dy = 0.001 * (r2 + 2 * y * y) + 2 * 0.002 * x * y
        xd = np.concatenate([x * radial + dx, y * radial + dy], -1)
        px = xd * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        out = undistort_points(
            jnp.asarray(px), jnp.asarray(K), jnp.asarray(dist), iters=10
        )
        np.testing.assert_allclose(np.asarray(out), xn, atol=1e-6)


class TestTriangulation:
    def test_exact_recovery(self, synthetic_scene):
        s = synthetic_scene
        x0 = _normalize(s["obs"][0], s["K"])
        x3 = _normalize(s["obs"][3], s["K"])
        P0 = pose_matrix(jnp.asarray(s["R"][0]), jnp.asarray(s["t"][0]))
        P3 = pose_matrix(jnp.asarray(s["R"][3]), jnp.asarray(s["t"][3]))
        X = triangulate_dlt(P0, P3, x0, x3)
        np.testing.assert_allclose(np.asarray(X), s["points"], atol=1e-3)

    def test_filter_rejects_bad_matches(self, synthetic_scene):
        s = synthetic_scene
        obs0 = s["obs"][0].copy()
        obs3 = s["obs"][3].copy()
        # Corrupt 30 observations -> wrong matches.
        obs3[:30] += 80.0
        x0 = _normalize(obs0, s["K"])
        x3 = _normalize(obs3, s["K"])
        X, keep = triangulate_and_filter(
            jnp.asarray(s["R"][0]),
            jnp.asarray(s["t"][0]),
            jnp.asarray(s["R"][3]),
            jnp.asarray(s["t"][3]),
            x0,
            x3,
            jnp.asarray(obs0),
            jnp.asarray(obs3),
            jnp.asarray(s["K"]),
            jnp.ones(len(obs0), bool),
            max_error_px=6.0,
        )
        keep = np.asarray(keep)
        assert not keep[:30].any()
        assert keep[30:].all()
        np.testing.assert_allclose(
            np.asarray(X)[30:], s["points"][30:], atol=1e-3
        )


class TestEssential:
    def test_pose_recovery_exact(self, synthetic_scene):
        s = synthetic_scene
        i, j = 0, 2
        x1 = _normalize(s["obs"][i], s["K"])
        x2 = _normalize(s["obs"][j], s["K"])
        valid = jnp.ones(x1.shape[0], bool)
        pose = estimate_relative_pose(
            jax.random.key(0), x1, x2, valid, focal=s["K"][0, 0]
        )
        R_gt, t_gt = _relpose(s, i, j)
        assert bool(pose.ok)
        assert int(pose.n_inliers) > 190
        np.testing.assert_allclose(np.asarray(pose.R), R_gt, atol=1e-3)
        t_dir = t_gt / np.linalg.norm(t_gt)
        np.testing.assert_allclose(np.asarray(pose.t), t_dir, atol=1e-3)

    def test_pose_recovery_with_outliers(self, synthetic_scene):
        s = synthetic_scene
        i, j = 1, 4
        obs2 = s["obs"][j].copy()
        rng = np.random.default_rng(7)
        bad = rng.choice(len(obs2), 60, replace=False)
        obs2[bad] = rng.uniform([0, 0], [640, 480], (60, 2))
        x1 = _normalize(s["obs"][i], s["K"])
        x2 = _normalize(obs2, s["K"])
        valid = jnp.ones(x1.shape[0], bool)
        pose = estimate_relative_pose(
            jax.random.key(1), x1, x2, valid, focal=s["K"][0, 0]
        )
        R_gt, t_gt = _relpose(s, i, j)
        assert bool(pose.ok)
        np.testing.assert_allclose(np.asarray(pose.R), R_gt, atol=5e-3)
        t_dir = t_gt / np.linalg.norm(t_gt)
        np.testing.assert_allclose(np.asarray(pose.t), t_dir, atol=5e-3)
        # Outliers excluded from the inlier set.
        inl = np.asarray(pose.inliers)
        assert inl[bad].sum() < 5

    def test_sampson_zero_on_exact(self, synthetic_scene):
        s = synthetic_scene
        R, t = _relpose(s, 0, 1)
        t_hat = np.array(
            [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
        )
        E = t_hat @ R
        x1 = _normalize(s["obs"][0], s["K"])
        x2 = _normalize(s["obs"][1], s["K"])
        d = sampson_distance(jnp.asarray(E), x1, x2)
        assert float(jnp.max(d)) < 1e-8

    def test_decompose_essential_contains_truth(self, synthetic_scene):
        s = synthetic_scene
        R_gt, t_gt = _relpose(s, 0, 1)
        t_dir = t_gt / np.linalg.norm(t_gt)
        t_hat = np.array(
            [
                [0, -t_dir[2], t_dir[1]],
                [t_dir[2], 0, -t_dir[0]],
                [-t_dir[1], t_dir[0], 0],
            ]
        )
        E = t_hat @ R_gt
        Rs, ts = decompose_essential(jnp.asarray(E))
        found = False
        for k in range(4):
            if np.allclose(np.asarray(Rs[k]), R_gt, atol=1e-5) and np.allclose(
                np.asarray(ts[k]), t_dir, atol=1e-5
            ):
                found = True
        assert found


class TestPnP:
    def test_exact_pose(self, synthetic_scene):
        s = synthetic_scene
        v = 3
        xn = _normalize(s["obs"][v], s["K"])
        res = solve_pnp_ransac(
            jax.random.key(0),
            jnp.asarray(s["points"]),
            jnp.asarray(s["obs"][v]),
            xn,
            jnp.ones(len(s["points"]), bool),
            jnp.asarray(s["K"]),
            threshold_px=3.84,
        )
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.R), s["R"][v], atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.t), s["t"][v], atol=1e-4)

    def test_with_outliers_and_noise(self, synthetic_scene):
        s = synthetic_scene
        v = 5
        rng = np.random.default_rng(11)
        obs = s["obs"][v] + rng.normal(0, 0.5, s["obs"][v].shape)
        bad = rng.choice(len(obs), 50, replace=False)
        obs[bad] = rng.uniform([0, 0], [640, 480], (50, 2))
        xn = _normalize(obs, s["K"])
        res = solve_pnp_ransac(
            jax.random.key(2),
            jnp.asarray(s["points"]),
            jnp.asarray(obs),
            xn,
            jnp.ones(len(obs), bool),
            jnp.asarray(s["K"]),
            threshold_px=3.84,
        )
        assert bool(res.ok)
        # Rotation within ~0.5 degrees.
        dR = np.asarray(res.R) @ s["R"][v].T
        angle = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert angle < 0.01
        assert np.linalg.norm(np.asarray(res.t) - s["t"][v]) < 0.02
        inl = np.asarray(res.inliers)
        assert inl[bad].sum() < 5


class TestHomography:
    def test_planar_scene_full_inliers(self):
        rng = np.random.default_rng(3)
        H_gt = np.array([[1.1, 0.05, 10.0], [-0.03, 0.95, -5.0], [1e-4, -2e-4, 1.0]])
        x1 = rng.uniform([50, 50], [600, 400], (100, 2))
        h = np.concatenate([x1, np.ones((100, 1))], -1) @ H_gt.T
        x2 = h[:, :2] / h[:, 2:]
        H, inl, n = homography_ransac(
            jax.random.key(0),
            jnp.asarray(x1),
            jnp.asarray(x2),
            jnp.ones(100, bool),
            threshold=2.5,
        )
        assert int(n) == 100
        err = transfer_error(H, jnp.asarray(x1), jnp.asarray(x2))
        assert float(jnp.max(err)) < 0.5

    def test_nonplanar_scene_partial_inliers(self, synthetic_scene):
        """A 3D (non-planar) scene viewed from two positions must NOT be
        fully explained by a homography — the degeneracy signal the
        reference uses for pair scoring (src/Sfm.cpp:545)."""
        s = synthetic_scene
        H, inl, n = homography_ransac(
            jax.random.key(1),
            jnp.asarray(s["obs"][0]),
            jnp.asarray(s["obs"][5]),
            jnp.ones(s["obs"].shape[1], bool),
            threshold=0.004 * 640,
        )
        assert int(n) < s["obs"].shape[1] * 0.9


def test_planar_pair_rejected_as_seed():
    """A planar-dominant pair (H explains everything E does) must be marked
    unusable for seeding — the live form of the reference's
    findHomographyInliers scoring (src/Sfm.cpp:545,667-689). E-only scoring
    accepts such pairs and initializes from an unconstrained pose."""
    import numpy as np
    from sfm_danpipeline_tpu.config import PipelineConfig
    from sfm_danpipeline_tpu.ops.matching import PairMatches
    from sfm_danpipeline_tpu.pipeline.bootstrap import score_pairs

    rng = np.random.default_rng(11)
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1.0]])
    M = 256

    def project(X, R, t):
        c = X @ R.T + t
        uv = c[:, :2] / c[:, 2:3]
        return uv * [800, 800] + [320, 240]

    ang = 0.25
    R2 = np.array([
        [np.cos(ang), 0, np.sin(ang)],
        [0, 1, 0],
        [-np.sin(ang), 0, np.cos(ang)],
    ])
    t2 = np.array([-0.8, 0.05, 0.1])

    def scene(flat):
        X = rng.uniform(-1.5, 1.5, (M, 3))
        X[:, 2] = 5.0 + flat * X[:, 2]
        p1 = project(X, np.eye(3), np.zeros(3)) + rng.normal(0, 0.3, (M, 2))
        p2 = project(X, R2, t2) + rng.normal(0, 0.3, (M, 2))
        return p1, p2

    # Two "views" with keypoints = the projections; identity matches.
    p1_plane, p2_plane = scene(0.0)   # pure plane
    p1_3d, p2_3d = scene(1.0)         # full 3D structure
    kp_xy = jnp.asarray(
        np.stack([p1_plane, p2_plane, p1_3d, p2_3d]), jnp.float32
    )
    idx = jnp.tile(jnp.arange(M, dtype=jnp.int32)[None], (2, 1))
    matches = PairMatches(
        idx_a=idx,
        idx_b=idx,
        dist=jnp.zeros((2, M), jnp.float32),
        lowe=jnp.zeros((2, M), jnp.float32),
        valid=jnp.ones((2, M), bool),
    )
    cfg = PipelineConfig()
    scores = score_pairs(
        jax.random.key(2), matches, kp_xy,
        jnp.asarray([0, 2], jnp.int32), jnp.asarray([1, 3], jnp.int32),
        jnp.asarray(K, jnp.float32), jnp.zeros(5, jnp.float32),
        jnp.asarray(640.0, jnp.float32), cfg,
    )
    assert not bool(scores.usable[0]), (
        f"planar pair accepted (h/e={float(scores.h_over_e[0]):.2f})"
    )
    assert bool(scores.usable[1]), (
        f"3D pair rejected (h/e={float(scores.h_over_e[1]):.2f})"
    )
