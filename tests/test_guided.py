"""Unit tests for guided bridge registration (pipeline/guided.py).

Synthetic arc: a registered 6-view map observing a point ball, a 7th view
with known ground-truth pose whose PAIRWISE match table to the anchor view
is available (the pose-graph edge), descriptors shared per 3D point. The
kernel must recover the baseline scale from track-anchored matches, find
the pose via guided matching + PnP, and commit observations — including
when a fraction of the anchor-edge matches are corrupted (the bridge
regime) and when the relative rotation carries realistic epipolar error.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.ops.lie import exp_so3, log_so3
from sfm_danpipeline_tpu.pipeline.guided import guided_bridge_register
from sfm_danpipeline_tpu.pipeline.tracks import init_state

V = 8  # capacity views (6 registered + new + spare)
KMAX = 256
N_PTS = 300
CAP = 1024
M = 256
F = 500.0


def _make_setup(rng, corrupt_frac=0.0, rot_err_deg=0.0):
    pts = rng.uniform(-1.0, 1.0, (N_PTS, 3)).astype(np.float64)
    pts[:, 2] *= 0.5
    K = np.array([[F, 0, 320.0], [0, F, 240.0], [0, 0, 1.0]])

    def cam(v):
        ang = 0.25 * v - 0.75
        C = 6.0 * np.array([np.sin(ang), 0.0, np.cos(ang)])
        z = -C / np.linalg.norm(C)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        return R, -R @ C

    done = list(range(6))
    new_view = 6
    poses = {v: cam(v) for v in range(7)}

    # Keypoints: each view observes every point (generous overlap).
    kp_xy = np.zeros((V, KMAX, 2), np.float32)
    kp_valid = np.zeros((V, KMAX), bool)
    desc = np.zeros((V, KMAX, 128), np.float32)
    base_desc = rng.normal(0, 1, (N_PTS, 128))
    base_desc /= np.linalg.norm(base_desc, axis=1, keepdims=True)
    feat_of = {}
    for v in range(7):
        R, t = poses[v]
        camp = pts @ R.T + t
        uv = camp[:, :2] / camp[:, 2:3]
        px = uv * F + [320.0, 240.0]
        ids = np.where(
            (camp[:, 2] > 0.5)
            & (np.abs(uv[:, 0]) < 0.6)
            & (np.abs(uv[:, 1]) < 0.45)
        )[0][:KMAX]
        kp_xy[v, : len(ids)] = px[ids] + rng.normal(0, 0.3, (len(ids), 2))
        kp_valid[v, : len(ids)] = True
        d = base_desc[ids] + 0.05 * rng.normal(0, 1, (len(ids), 128))
        desc[v, : len(ids)] = d / np.linalg.norm(d, axis=1, keepdims=True)
        fmap = np.full(N_PTS, -1, np.int64)
        fmap[ids] = np.arange(len(ids))
        feat_of[v] = fmap

    # Registered state: views 0-5 + all points with tracks.
    state = init_state(V, KMAX, CAP, F)
    cams = np.zeros((V, 6), np.float32)
    cam_valid = np.zeros((V,), bool)
    for v in done:
        R, t = poses[v]
        cams[v, :3] = np.asarray(log_so3(jnp.asarray(R, jnp.float32)))
        cams[v, 3:] = t
        cam_valid[v] = True
    tf = np.full((CAP, V), -1, np.int32)
    f2p = np.full((V, KMAX), -1, np.int32)
    for p in range(N_PTS):
        for v in done:
            if feat_of[v][p] >= 0:
                tf[p, v] = feat_of[v][p]
                f2p[v, feat_of[v][p]] = p
    pts_valid = np.zeros((CAP,), bool)
    pts_valid[:N_PTS] = True
    xyz = np.zeros((CAP, 3), np.float32)
    xyz[:N_PTS] = pts
    state = dataclasses.replace(
        state,
        cameras=jnp.asarray(cams),
        camera_valid=jnp.asarray(cam_valid),
        points_xyz=jnp.asarray(xyz),
        points_valid=jnp.asarray(pts_valid),
        track_feat=jnp.asarray(tf),
        feat_to_point=jnp.asarray(f2p),
        n_points=jnp.asarray(N_PTS, jnp.int32),
    )

    # Pose-graph edge (d_star=5 -> new): gt relative pose, perturbed.
    d_star = 5
    R_d, t_d = poses[d_star]
    R_n, t_n = poses[new_view]
    R_dn_true = R_n @ R_d.T
    C_d = -R_d.T @ t_d
    C_n = -R_n.T @ t_n
    s_true = float(np.linalg.norm(C_n - C_d))
    t_dn_true = (t_n - R_dn_true @ t_d) / s_true
    if rot_err_deg > 0:
        ax = rng.normal(0, 1, 3)
        ax = ax / np.linalg.norm(ax) * np.radians(rot_err_deg)
        R_err = np.asarray(exp_so3(jnp.asarray(ax, jnp.float32)))
        R_dn_true = R_err @ R_dn_true
    # Basin 1 = junk (a wrong rotation), to test basin selection.
    R_junk = np.asarray(
        exp_so3(jnp.asarray([0.0, 2.5, 0.0], jnp.float32))
    ) @ R_dn_true
    R_dn = np.stack([R_dn_true, R_junk]).astype(np.float32)
    t_dn = np.stack([t_dn_true, -t_dn_true]).astype(np.float32)

    # Edge match table (new, d_star): true correspondences with a
    # corrupt_frac of wrong associations (the bridge regime).
    common = [
        p for p in range(N_PTS)
        if feat_of[new_view][p] >= 0 and feat_of[d_star][p] >= 0
    ]
    rng.shuffle(common)
    common = common[:M]
    ia = np.zeros((M,), np.int32)
    ib = np.zeros((M,), np.int32)
    mv = np.zeros((M,), bool)
    for k, p in enumerate(common):
        ia[k] = feat_of[new_view][p]
        q = p
        if rng.uniform() < corrupt_frac:
            q = int(rng.integers(0, N_PTS))
        ib[k] = max(feat_of[d_star][q], 0)
        mv[k] = feat_of[d_star][q] >= 0
    ft_a = np.zeros((V, V, M), np.int32)
    ft_b = np.zeros((V, V, M), np.int32)
    vt = np.zeros((V, V, M), bool)
    ft_a[new_view, d_star] = ia
    ft_b[new_view, d_star] = ib
    vt[new_view, d_star] = mv

    colors = np.zeros((V, KMAX, 3), np.float32)
    sweep = np.concatenate(
        [np.linspace(0.2, 6.0, 48), -np.linspace(0.2, 6.0, 48)]
    ).astype(np.float32)
    dv = np.full((V,), -1, np.int32)
    dv[: len(done)] = done
    return (
        state, new_view, d_star, R_dn, t_dn, sweep, kp_xy, desc,
        kp_valid, colors, ft_a, ft_b, vt, K, s_true, poses, dv,
    )


def _run(setup, cfg=None):
    (
        state, new_view, d_star, R_dn, t_dn, sweep, kp_xy, desc,
        kp_valid, colors, ft_a, ft_b, vt, K, s_true, poses, dv,
    ) = setup
    cfg = cfg or PipelineConfig()
    state2, stats = guided_bridge_register(
        jax.random.key(3), state, jnp.asarray(new_view, jnp.int32),
        jnp.asarray(dv), jnp.asarray(d_star, jnp.int32),
        jnp.asarray(R_dn), jnp.asarray(t_dn), jnp.asarray(sweep),
        jnp.asarray(kp_xy), jnp.asarray(desc), jnp.asarray(kp_valid),
        jnp.asarray(colors), jnp.asarray(ft_a), jnp.asarray(ft_b),
        jnp.asarray(vt), jnp.asarray(K, jnp.float32),
        jnp.zeros((5,), jnp.float32), jnp.asarray(640.0, jnp.float32),
        jnp.asarray(1.5, jnp.float32),
        cfg, 512, int(sweep.shape[0]),
    )
    return state2, np.asarray(stats)


def _pose_err(state, new_view, poses):
    R_gt, t_gt = poses[new_view]
    cam = np.asarray(state.cameras[new_view])
    R = np.asarray(exp_so3(jnp.asarray(cam[:3])))
    C = -R.T @ cam[3:]
    C_gt = -R_gt.T @ t_gt
    dR = R @ R_gt.T
    ang = np.degrees(
        np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    )
    return ang, float(np.linalg.norm(C - C_gt))


def test_guided_register_clean_edge():
    rng = np.random.default_rng(0)
    setup = _make_setup(rng)
    state2, stats = _run(setup)
    assert stats[0] == 1, stats
    ang, dc = _pose_err(state2, 6, setup[15])
    assert ang < 0.5, ang
    assert dc < 0.05, dc
    # Observations committed for the new view.
    n_obs_new = int(jnp.sum(state2.track_feat[:, 6] >= 0))
    assert n_obs_new >= 50, n_obs_new


def test_guided_register_corrupted_edge_and_rot_error():
    """The bridge regime: 60% of anchor-edge matches wrong, 1.5 deg
    relative-rotation error. Anchored scale + guided matching must still
    land the pose (transitive PnP at this corruption is hopeless)."""
    rng = np.random.default_rng(1)
    setup = _make_setup(rng, corrupt_frac=0.6, rot_err_deg=1.5)
    state2, stats = _run(setup)
    assert stats[0] == 1, stats
    ang, dc = _pose_err(state2, 6, setup[15])
    assert ang < 1.0, ang
    assert dc < 0.15, dc


def test_guided_register_rejects_without_support():
    """Empty edge + junk rotations must not register."""
    rng = np.random.default_rng(2)
    setup = _make_setup(rng, corrupt_frac=1.0)
    lst = list(setup)
    # Make both basins junk so neither sweep finds consensus.
    R_dn = np.asarray(lst[3]).copy()
    R_dn[0] = np.asarray(
        exp_so3(jnp.asarray([1.7, 0.0, 1.1], jnp.float32))
    ) @ R_dn[0]
    lst[3] = R_dn
    state2, stats = _run(tuple(lst))
    assert stats[0] == 0, stats
    assert not bool(state2.camera_valid[6])
