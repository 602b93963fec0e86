"""Sim(3) estimation (ops/similarity.py) + component merging
(pipeline/merge.py) — the multi-component capability that goes beyond the
reference's drop-on-PnP-failure behavior (src/Sfm.cpp:955-958)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfm_danpipeline_tpu.ops.lie import exp_so3
from sfm_danpipeline_tpu.ops.similarity import (
    Sim3,
    apply_sim3,
    estimate_sim3_ransac,
    umeyama,
)
from sfm_danpipeline_tpu.pipeline.merge import (
    cross_component_pairs,
    merge_components,
)
from sfm_danpipeline_tpu.pipeline.tracks import init_state


def _random_sim3(rng) -> Sim3:
    R = exp_so3(jnp.asarray(rng.normal(size=3) * 0.7, jnp.float32))
    return Sim3(
        s=jnp.asarray(rng.uniform(0.5, 2.0), jnp.float32),
        R=R,
        t=jnp.asarray(rng.normal(size=3), jnp.float32),
    )


def test_umeyama_exact_recovery():
    rng = np.random.default_rng(0)
    sim = _random_sim3(rng)
    X = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    Y = apply_sim3(sim, X)
    est = umeyama(X, Y)
    np.testing.assert_allclose(float(est.s), float(sim.s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(est.R), np.asarray(sim.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(est.t), np.asarray(sim.t), atol=1e-4)


def test_umeyama_weighted_ignores_zero_weight_outliers():
    rng = np.random.default_rng(1)
    sim = _random_sim3(rng)
    X = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    Y = apply_sim3(sim, X)
    Y = Y.at[:10].add(jnp.asarray(rng.normal(size=(10, 3)) * 50, jnp.float32))
    w = jnp.asarray(np.r_[np.zeros(10), np.ones(30)], jnp.float32)
    est = umeyama(X, Y, w)
    np.testing.assert_allclose(np.asarray(est.R), np.asarray(sim.R), atol=1e-3)


def test_sim3_ransac_with_outliers():
    rng = np.random.default_rng(2)
    sim = _random_sim3(rng)
    M = 200
    X = jnp.asarray(rng.normal(size=(M, 3)) * 3, jnp.float32)
    Y = apply_sim3(sim, X)
    Y = Y + jnp.asarray(rng.normal(size=(M, 3)) * 0.002, jnp.float32)
    # 40% gross outliers
    n_out = 80
    Y = Y.at[:n_out].set(jnp.asarray(rng.normal(size=(n_out, 3)) * 10, jnp.float32))
    valid = jnp.ones((M,), bool)
    res = estimate_sim3_ransac(jax.random.key(0), X, Y, valid, threshold=0.05)
    assert bool(res.ok)
    assert int(res.n_inliers) >= 100
    # outlier rows must not be inliers (they are iid gaussian far away)
    assert int(jnp.sum(res.inliers[:n_out])) <= 5
    np.testing.assert_allclose(float(res.sim.s), float(sim.s), rtol=0.02)
    np.testing.assert_allclose(np.asarray(res.sim.R), np.asarray(sim.R), atol=0.02)


def test_sim3_ransac_rejects_thin_support():
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)  # no structure
    valid = jnp.zeros((64,), bool).at[:5].set(True)
    res = estimate_sim3_ransac(jax.random.key(1), X, Y, valid, threshold=0.01)
    assert not bool(res.ok)


# ----------------------------------------------------------------------
def _two_component_states():
    """A owns views {0,1} with 3 points; B owns views {2,3} with 3 points in
    a Sim(3)-displaced frame. B point 0 corresponds to A point 0."""
    rng = np.random.default_rng(4)
    sim = _random_sim3(rng)
    V, Kp, P = 4, 8, 16
    a = init_state(V, Kp, P, focal=100.0)
    b = init_state(V, Kp, P, focal=100.0)

    xyz_a = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
    a = dataclasses.replace(
        a,
        points_xyz=a.points_xyz.at[:3].set(xyz_a),
        points_valid=a.points_valid.at[:3].set(True),
        track_feat=a.track_feat.at[:3, 0].set(jnp.arange(3, dtype=jnp.int32))
        .at[:3, 1].set(jnp.arange(3, dtype=jnp.int32) + 1),
        feat_to_point=a.feat_to_point.at[0, :3].set(
            jnp.arange(3, dtype=jnp.int32)
        ),
        camera_valid=a.camera_valid.at[:2].set(True),
        cameras=a.cameras.at[1, 3].set(1.0),
        n_points=jnp.asarray(3, jnp.int32),
    )
    # B frame: X_b such that apply_sim3(sim, X_b) lands in A's frame;
    # B point 0 coincides with A point 0 once aligned.
    xyz_b_in_a = jnp.concatenate(
        [xyz_a[:1], jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)]
    )
    inv_s = 1.0 / sim.s
    xyz_b = inv_s * ((xyz_b_in_a - sim.t) @ sim.R)
    cam_b = jnp.zeros((V, 6), jnp.float32).at[2, 3:].set(
        jnp.asarray([0.1, 0.0, 2.0])
    ).at[3, :3].set(jnp.asarray([0.0, 0.3, 0.0]))
    b = dataclasses.replace(
        b,
        points_xyz=b.points_xyz.at[:3].set(xyz_b),
        points_valid=b.points_valid.at[:3].set(True),
        track_feat=b.track_feat.at[:3, 2].set(jnp.arange(3, dtype=jnp.int32))
        .at[:3, 3].set(jnp.arange(3, dtype=jnp.int32) + 2),
        feat_to_point=b.feat_to_point.at[2, :3].set(
            jnp.arange(3, dtype=jnp.int32)
        ),
        cameras=cam_b,
        camera_valid=b.camera_valid.at[2:4].set(True),
        n_points=jnp.asarray(3, jnp.int32),
    )
    return a, b, sim


def test_merge_components_geometry_and_tracks():
    a, b, sim = _two_component_states()
    pid_a = jnp.zeros((4,), jnp.int32)
    pid_b = jnp.zeros((4,), jnp.int32)
    fuse = jnp.zeros((4,), bool).at[0].set(True)  # fuse (A:0, B:0)
    merged = merge_components(a, b, sim, pid_a, pid_b, fuse)

    # 3 A points + 2 appended (B:1, B:2); B:0 fused away.
    assert int(merged.n_points) == 5
    assert int(jnp.sum(merged.points_valid)) == 5
    assert bool(jnp.all(merged.camera_valid[:4]))
    # appended B points landed in A's frame
    want = apply_sim3(sim, b.points_xyz[1:3])
    got = merged.points_xyz[3:5]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # fused track: A point 0 now also observed in views 2 and 3
    assert int(merged.track_feat[0, 2]) == 0
    assert int(merged.track_feat[0, 3]) == 2
    # A observations untouched
    assert int(merged.track_feat[0, 0]) == 0
    # inverse map: view 2 feature 0 -> fused point 0
    assert int(merged.feat_to_point[2, 0]) == 0
    # view 2 feature 1 (B point 1) -> an appended slot holding its geometry
    slot = int(merged.feat_to_point[2, 1])
    assert slot >= 3
    np.testing.assert_allclose(
        np.asarray(merged.points_xyz[slot]),
        np.asarray(apply_sim3(sim, b.points_xyz[1])),
        atol=1e-4,
    )


def test_merge_components_camera_projection_invariance():
    """The transformed camera must project a transformed point to the same
    pixel: camera coords scale uniformly by s under the merge map."""
    a, b, sim = _two_component_states()
    merged = merge_components(
        a, b, sim,
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), bool),
    )
    for v in (2, 3):
        Rb, tb = exp_so3(b.cameras[v, :3]), b.cameras[v, 3:]
        Rm, tm = exp_so3(merged.cameras[v, :3]), merged.cameras[v, 3:]
        Xb = b.points_xyz[1]
        Xa = apply_sim3(sim, Xb)
        pc_b = Rb @ Xb + tb
        pc_m = Rm @ Xa + tm
        np.testing.assert_allclose(
            np.asarray(pc_m / pc_m[2]), np.asarray(pc_b / pc_b[2]), atol=1e-4
        )


def test_cross_component_pairs_finds_candidates():
    a, b, sim = _two_component_states()
    V, M = 4, 6
    ft_a = jnp.zeros((V, V, M), jnp.int32)
    ft_b = jnp.zeros((V, V, M), jnp.int32)
    vt = jnp.zeros((V, V, M), bool)
    # view 0 (A) matches view 2 (B): feature i <-> feature i for i<3
    ft_a = ft_a.at[0, 2, :3].set(jnp.arange(3, dtype=jnp.int32))
    ft_b = ft_b.at[0, 2, :3].set(jnp.arange(3, dtype=jnp.int32))
    vt = vt.at[0, 2, :3].set(True)
    Xa, Xb, pid_a, pid_b, va, fa, m = cross_component_pairs(
        a, b, ft_a, ft_b, vt
    )
    n = int(jnp.sum(m))
    assert n == 3
    # each candidate links A point i to B point i, in each state's own frame
    got_a = np.asarray(Xa[:n])
    got_b = np.asarray(Xb[:n])
    ids_a = np.asarray(pid_a[:n])
    ids_b = np.asarray(pid_b[:n])
    assert set(ids_a.tolist()) == {0, 1, 2}
    for k in range(n):
        np.testing.assert_allclose(
            got_a[k], np.asarray(a.points_xyz[ids_a[k]]), atol=1e-6
        )
        np.testing.assert_allclose(
            got_b[k], np.asarray(b.points_xyz[ids_b[k]]), atol=1e-6
        )
