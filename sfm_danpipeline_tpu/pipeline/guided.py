"""Guided bridge registration: map-projection matching for views that fail
transitive 2D-3D registration.

The reference's incremental loop builds 2D-3D support transitively — a new
view's keypoints reach 3D points only through a pairwise descriptor match
with a view that already observes them (find2D3DMatches,
/root/reference/src/Sfm.cpp:1011-1090) — and simply loses every view whose
pairwise matches across a viewpoint break are too thin for PnP
(src/Sfm.cpp:955-958 skips them). On temple the 5->6 hemisphere break holds
~10-12 true tight 2D-3D rows out of ~480 at 2-4% inlier rate (r4 bridge
study): transitive support is irreducibly starved there, because Lowe-ratio
matching across a 30-40 degree viewpoint change rejects almost everything.

Guided matching removes the transitive bottleneck. Once a COARSE pose for
the new view exists, every map point can be projected into it and matched
DIRECTLY against the view's keypoints under a projection-locality gate —
the spatial prior replaces the ratio test's job of disambiguation, so
weaker descriptor agreement suffices and the support pool grows by an
order of magnitude. The coarse pose comes from the pose graph:

  1. the relative ROTATION to the best-matched registered view is known
     from two-view epipolar scoring (pipeline/bootstrap.score_pairs keeps
     both basin candidates per edge), which fixes 5 of 6 DOF;
  2. the remaining baseline SCALE is a single scalar — recovered by
     sweeping s over a range bracketing the component's typical baseline
     and counting descriptor-compatible keypoints that land within a
     small radius of their point's projection (a 1-parameter consensus
     vote that succeeds at inlier counts where 6-DoF RANSAC is a
     lottery);
  3. guided matching at the swept pose feeds the SAME strict PnP
     verification as normal registration (threshold 0.006*maxdim,
     pnp_min_inliers) — the acceptance bar is unchanged, only the
     support is denser;
  4. a second, tighter guided-match round at the PnP-refined pose
     expands support further before the final Gauss-Newton polish.

Everything is one fused jitted program (TPU-native: the K x B descriptor
affinity is one MXU contraction; the scale sweep is a vmapped projection
count; no data-dependent shapes).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.ops.lie import exp_so3, log_so3
from sfm_danpipeline_tpu.ops.pnp import (
    _gauss_newton_refine,
    _reproj_errors_px,
    solve_pnp_ransac,
)
from sfm_danpipeline_tpu.ops.projection import undistort_points
from sfm_danpipeline_tpu.pipeline.tracks import ReconstructionState


def _project(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
             K: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel projections (N, 2) + in-front mask (N,)."""
    cam = X @ R.T + t
    z = jnp.where(jnp.abs(cam[:, 2:3]) < 1e-9, 1e-9, cam[:, 2:3])
    uv = cam[:, :2] / z
    px = uv * jnp.array([K[0, 0], K[1, 1]]) + jnp.array([K[0, 2], K[1, 2]])
    return px, cam[:, 2] > 0


def _rep_descriptors(
    state: ReconstructionState,
    descriptors: jnp.ndarray,  # (V, K, 128)
    done_mask: jnp.ndarray,  # (V,)
    d_star: jnp.ndarray,  # () int32 anchor done view
    n_bucket: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One representative descriptor per map point (bucket prefix).

    Preference order: the observation in the anchor view d_star (the done
    view nearest the bridge — its viewpoint is the most matchable across
    the break), else the observing done view whose camera center is
    closest to d_star's. Returns (desc (B, 128), has_obs (B,))."""
    tf = state.track_feat[:n_bucket]  # (B, V)
    V = tf.shape[1]
    R_all = jax.vmap(exp_so3)(state.cameras[:, :3])
    C_all = -jnp.einsum("vij,vi->vj", R_all, state.cameras[:, 3:])
    d2 = jnp.sum((C_all - C_all[d_star]) ** 2, axis=-1)  # (V,)
    pref = jnp.where(jnp.arange(V) == d_star, -1.0, d2)  # d_star wins
    observing = (tf >= 0) & done_mask[None, :]
    score = jnp.where(observing, -pref[None, :], -jnp.inf)  # (B, V)
    rep_view = jnp.argmax(score, axis=-1)  # (B,)
    has = jnp.any(observing, axis=-1)
    feat = jnp.clip(tf[jnp.arange(n_bucket), rep_view], 0)
    desc = descriptors[rep_view, feat]  # (B, 128)
    return desc, has


@functools.partial(
    jax.jit, static_argnames=("config", "n_bucket", "n_sweep")
)
def guided_bridge_register(
    key: jax.Array,
    state: ReconstructionState,
    new_view: jnp.ndarray,
    done_views: jnp.ndarray,  # (V,) sorted done ids, -1 padded
    d_star: jnp.ndarray,  # () the anchor done view of the pose-graph edge
    R_dn: jnp.ndarray,  # (2, 3, 3) basin relative rotations d_star -> new
    t_dn: jnp.ndarray,  # (2, 3) unit relative translation directions
    sweep_s: jnp.ndarray,  # (n_sweep,) fallback candidate baseline scales
    keypoints_xy: jnp.ndarray,  # (V, K, 2)
    descriptors: jnp.ndarray,  # (V, K, 128)
    kp_valid: jnp.ndarray,  # (V, K)
    colors: jnp.ndarray,
    feat_tab_a: jnp.ndarray,
    feat_tab_b: jnp.ndarray,
    valid_tab_strict: jnp.ndarray,
    K_mat: jnp.ndarray,
    dist: jnp.ndarray,
    image_max_dim: jnp.ndarray,
    b_med: jnp.ndarray,  # () typical done-camera spacing (world units)
    config: PipelineConfig,
    n_bucket: int,
    n_sweep: int,
) -> Tuple[ReconstructionState, jnp.ndarray]:
    """Register `new_view` by guided map-projection matching (see module
    docstring). Returns (state, stats[5] = [ok, n_inliers, n_support,
    n_points, n_obs]) mirroring incremental.register_and_triangulate."""
    from sfm_danpipeline_tpu.pipeline.incremental import (
        triangulate_new_view_all,
    )

    g = config.geometry
    B = n_bucket
    V = keypoints_xy.shape[0]
    done_mask = jnp.zeros((V,), bool).at[jnp.clip(done_views, 0)].set(
        done_views >= 0
    )

    X = state.points_xyz[:B]
    pt_live = state.points_valid[:B]
    rep_desc, has_obs = _rep_descriptors(
        state, descriptors, done_mask, d_star, B
    )
    pt_ok = pt_live & has_obs

    kp_xy = keypoints_xy[new_view]  # (K, 2)
    kp_d = descriptors[new_view]  # (K, 128)
    kv = kp_valid[new_view]
    Kk = kp_xy.shape[0]

    # Descriptor affinity, ONE MXU contraction. L2-normalized SIFT:
    # ||a - b||^2 = 2 - 2 a.b.
    dot = jnp.dot(kp_d, rep_desc.T, preferred_element_type=jnp.float32)
    desc_d2 = jnp.maximum(2.0 - 2.0 * dot, 0.0)  # (K, B)

    # Absolute-pose candidates per basin: x_new = R_dn x_d + s t_dn and
    # x_d = R_d x_w + t_d give R_new = R_dn R_d, t_new(s) = R_dn t_d +
    # s t_dn with s = |baseline| in world units.
    cam_d = state.cameras[d_star]
    R_d = exp_so3(cam_d[:3])
    t_d = cam_d[3:]
    R_cand = jnp.einsum("bij,jk->bik", R_dn, R_d)  # (2, 3, 3)
    t_base = jnp.einsum("bij,j->bi", R_dn, t_d)  # (2, 3)
    t_dir = t_dn

    # ---- Stage 0: ANCHORED baseline scale. Each strict (d_star, new)
    # match whose d_star feature already belongs to a 3D track determines
    # s outright: the track's known depth in d_star must equal the match's
    # two-ray triangulated depth at unit baseline, so s = z_track/z_unit.
    # This association runs through d_star's OWN feature (not cross-view
    # descriptor search), so it is immune to the repeated-structure
    # aliasing that can fool the projection-vote sweep on near-periodic
    # scenes (a wrong-by-one-column scale scores tight guided "inliers"
    # on the temple colonnade — measured r5: one camera-spacing pose
    # error). The projection sweep below then only fine-tunes around the
    # anchored median and disambiguates the basin.
    fn_e = feat_tab_a[new_view, d_star]  # (M,) feats in new
    fd_e = feat_tab_b[new_view, d_star]  # (M,) feats in d_star
    mv_e = valid_tab_strict[new_view, d_star]
    pid_e = state.feat_to_point[d_star, fd_e]  # (M,)
    pid_c = jnp.clip(pid_e, 0)
    anch = mv_e & (pid_e >= 0) & state.points_valid[pid_c]
    X_e = state.points_xyz[pid_c]
    z_track = (X_e @ R_d.T + t_d)[:, 2]  # depth of the track in d_star

    def bearing(px):
        x = (px[:, 0] - K_mat[0, 2]) / K_mat[0, 0]
        y = (px[:, 1] - K_mat[1, 2]) / K_mat[1, 1]
        v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    yd = bearing(keypoints_xy[d_star, fd_e])  # (M, 3)
    yn = bearing(keypoints_xy[new_view, fn_e])

    def anchored_scale(Rb, tb):
        a = jnp.cross(yn, yd @ Rb.T)  # (M, 3)
        c = jnp.cross(yn, jnp.broadcast_to(tb, yn.shape))
        z_unit = -jnp.sum(a * c, -1) / jnp.maximum(
            jnp.sum(a * a, -1), 1e-12
        )
        s_i = z_track / jnp.where(z_unit > 1e-6, z_unit, jnp.nan)
        s_max = jnp.max(jnp.abs(sweep_s))
        okr = (
            anch & (z_track > 1e-6) & jnp.isfinite(s_i)
            & (s_i > 0.0) & (s_i <= s_max)
        )
        s_i = jnp.nan_to_num(s_i, nan=-1.0)
        # MODE consensus, not median: a bridge edge's s_i distribution is
        # multimodal (wrong associations cluster at aliased scales on
        # repeated structure) and a median lands between modes. Vote over
        # the wide grid, refine as the median of the winning cell's
        # members.
        tol = 0.05 * jnp.abs(sweep_s)  # (S,)
        votes_a = jnp.sum(
            okr[None, :]
            & (jnp.abs(s_i[None, :] - sweep_s[:, None]) <= tol[:, None]),
            axis=1,
        )
        k = jnp.argmax(votes_a)
        s0 = sweep_s[k]
        near = okr & (jnp.abs(s_i - s0) <= 0.07 * jnp.abs(s0))
        s_ref = jnp.nanmedian(jnp.where(near, s_i, jnp.nan))
        return jnp.nan_to_num(s_ref, nan=1.0), jnp.sum(near)

    s_med, n_anch = jax.vmap(anchored_scale)(R_dn, t_dn)  # (2,), (2,)
    fine = jnp.linspace(0.75, 1.25, sweep_s.shape[0])

    # ---- Stage 1: baseline-scale sweep. For each point, its 2 most
    # descriptor-affine keypoints; a (basin, s) candidate scores one vote
    # per point whose projection lands within the sweep radius of such a
    # keypoint. 1-parameter consensus: ~10 true correspondences yield an
    # unambiguous peak where 6-DoF RANSAC at the same support is a lottery.
    sweep_thr2 = g.guided_sweep_desc_threshold**2
    d2_for_top = jnp.where(
        (kv[:, None] & pt_ok[None, :]), desc_d2, jnp.inf
    )
    top_d2, top_kp = jax.lax.top_k(-d2_for_top.T, 2)  # (B, 2)
    top_d2 = -top_d2
    cand_xy = kp_xy[top_kp]  # (B, 2, 2)
    cand_ok = (top_d2 <= sweep_thr2) & pt_ok[:, None]  # (B, 2)
    W_img = K_mat[0, 2] * 2.0
    H_img = K_mat[1, 2] * 2.0

    def score_pose(R, t):
        px, front = _project(X, R, t, K_mat)
        inb = (
            (px[:, 0] >= 0) & (px[:, 0] <= W_img)
            & (px[:, 1] >= 0) & (px[:, 1] <= H_img)
        )
        d = jnp.linalg.norm(cand_xy - px[:, None, :], axis=-1)  # (B, 2)
        hit = jnp.any(
            cand_ok & (d <= g.guided_sweep_radius_px), axis=-1
        )
        return jnp.sum(hit & front & inb)

    def sweep_basin(Rb, tb, td, grid):
        return jax.vmap(lambda s: score_pose(Rb, tb + s * td))(grid)

    # Anchored basins sweep a fine grid around their anchored scale; thin
    # edges (too few track-anchored matches) fall back to the wide sweep.
    grid_b = jnp.where(
        (n_anch >= 8)[:, None],
        s_med[:, None] * fine[None, :],
        sweep_s[None, :],
    )  # (2, n_sweep)
    votes = jax.vmap(sweep_basin)(R_cand, t_base, t_dir, grid_b)
    flat = jnp.argmax(votes.reshape(-1))
    basin = flat // n_sweep
    s_best = grid_b[basin, flat % n_sweep]
    R0 = R_cand[basin]
    t0 = t_base[basin] + s_best * t_dir[basin]

    # ---- Stage 2: guided match at the swept pose -> strict PnP RANSAC.
    desc_thr2 = g.guided_desc_threshold**2

    def guided_match(R, t, radius):
        """Per-keypoint best map point under projection locality. Returns
        (pid (K,), keep (K,)) deduped one keypoint per point."""
        px, front = _project(X, R, t, K_mat)
        pd = jnp.linalg.norm(
            kp_xy[:, None, :] - px[None, :, :], axis=-1
        )  # (K, B)
        ok = (
            kv[:, None]
            & (pt_ok & front)[None, :]
            & (pd <= radius)
            & (desc_d2 <= desc_thr2)
        )
        cost = jnp.where(ok, desc_d2, jnp.inf)
        pid = jnp.argmin(cost, axis=-1)  # (K,)
        best = cost[jnp.arange(Kk), pid]
        keep = jnp.isfinite(best)
        # Dedup: one keypoint per map point — best descriptor distance
        # wins (scatter-min, then identity check with index tiebreak).
        order = jnp.argsort(jnp.where(keep, best, jnp.inf), stable=True)
        pid_s = pid[order]
        keep_s = keep[order]
        rank = jnp.arange(Kk, dtype=jnp.int32)
        first = jnp.full((B,), Kk, jnp.int32).at[
            jnp.where(keep_s, pid_s, B - 1)
        ].min(jnp.where(keep_s, rank, Kk))
        keep_s = keep_s & (first[pid_s] == rank)
        inv = jnp.argsort(order, stable=True)
        return pid, keep_s[inv]

    pid1, keep1 = guided_match(R0, t0, g.guided_radius_px)
    thr = g.pnp_threshold_factor * image_max_dim
    X1 = X[pid1]
    xn1 = undistort_points(kp_xy, K_mat, dist)
    res = solve_pnp_ransac(
        key, X1, kp_xy, xn1, keep1, K_mat,
        threshold_px=thr,
        n_hypotheses=config.geometry.pnp_ransac_iters,
        max_translation=g.pnp_max_translation,
        min_inliers=g.pnp_min_inliers,
        sample_mask=keep1,
    )

    # ---- Stage 3: re-match at the refined pose with a tight radius and
    # polish. The refined pose kills the epipolar rotation error that
    # forced the wide first radius; the tight round adds the
    # correspondences locality had hidden.
    pid2, keep2 = guided_match(res.R, res.t, g.guided_radius2_px)
    X2 = X[pid2]
    w2 = keep2.astype(jnp.float32)
    R2, t2 = _gauss_newton_refine(res.R, res.t, X2, kp_xy, K_mat, w2)
    err = _reproj_errors_px(
        jnp.concatenate([R2, t2[:, None]], -1), X2, kp_xy, K_mat
    )
    inl = (err < thr) & keep2
    n_inl = jnp.sum(inl)
    center = -R2.T @ t2
    # Acceptance is decided by the FINAL refined consensus, not round-1
    # RANSAC's verdict: the swept pose's residual rotation error keeps the
    # round-1 tight count low (measured: 25-ish tight at 24 px locality),
    # while a genuinely wrong pose cannot survive the tight re-match —
    # an 8 px locality around garbage projections yields almost no
    # correspondences and the Gauss-Newton consensus collapses.
    # Collapse guard: a bridge pose essentially coincident with an
    # existing camera is the degenerate small-baseline attractor (every
    # far point projects consistently at s ~ 0), not a registration.
    R_all_d = jax.vmap(exp_so3)(state.cameras[:, :3])
    C_all = -jnp.einsum("vij,vi->vj", R_all_d, state.cameras[:, 3:])
    dcam = jnp.linalg.norm(C_all - center[None, :], axis=-1)
    dmin = jnp.min(jnp.where(done_mask, dcam, jnp.inf))
    ok = (
        (jnp.abs(jnp.linalg.det(R2) - 1.0) < 1e-3)
        & (jnp.linalg.norm(center) <= g.pnp_max_translation)
        & (n_inl >= g.pnp_min_inliers)
        & (dmin >= 0.25 * b_med)
    )

    # ---- Commit: pose + guided observations (track extension), then
    # triangulate vs every done view as normal registration does.
    cam = jnp.concatenate([log_so3(R2), t2])
    state = dataclasses.replace(
        state,
        cameras=jnp.where(
            ok, state.cameras.at[new_view].set(cam), state.cameras
        ),
        camera_valid=jnp.where(
            ok,
            state.camera_valid.at[new_view].set(True),
            state.camera_valid,
        ),
    )
    add = ok & inl & g.guided_keep_obs  # (K,) rows recorded as observations
    krange = jnp.arange(Kk, dtype=jnp.int32)
    # Guard: never overwrite an existing observation of the point in this
    # view (cannot happen for a fresh view; belt and braces for retries).
    fresh = state.track_feat[pid2, new_view] < 0
    addf = add & fresh
    # Point-indexed claim column via a dump-slot scatter (slot B is sliced
    # off; dedup above guarantees at most one add per point id).
    claim = jnp.full((B + 1,), -1, jnp.int32)
    claim = claim.at[jnp.where(addf, pid2, B)].set(
        jnp.where(addf, krange, -1)
    )
    claim = claim[:B]
    col = state.track_feat[:B, new_view]
    col_new = jnp.where((claim >= 0) & (col < 0), claim, col)
    f2p_new = jnp.where(addf, pid2, state.feat_to_point[new_view])
    state = dataclasses.replace(
        state,
        track_feat=state.track_feat.at[:B, new_view].set(col_new),
        feat_to_point=state.feat_to_point.at[new_view].set(f2p_new),
    )

    def tri(st):
        st2, _ = triangulate_new_view_all(
            st, new_view, done_views, feat_tab_a, feat_tab_b,
            valid_tab_strict, keypoints_xy, colors, K_mat, dist, config,
        )
        return st2

    state = jax.lax.cond(ok, tri, lambda st: st, state)
    n_obs = jnp.sum(
        (state.track_feat >= 0)
        & state.points_valid[:, None]
        & state.camera_valid[None, :]
    )
    stats = jnp.stack(
        [
            ok.astype(jnp.int32),
            n_inl.astype(jnp.int32),
            jnp.sum(keep1).astype(jnp.int32),
            state.n_points.astype(jnp.int32),
            n_obs.astype(jnp.int32),
            # Diagnostics: anchored-scale support per basin, chosen basin,
            # chosen baseline scale (x1000), winning sweep vote count.
            n_anch[0].astype(jnp.int32),
            n_anch[1].astype(jnp.int32),
            basin.astype(jnp.int32),
            (1000.0 * s_best).astype(jnp.int32),
            votes.reshape(-1)[flat].astype(jnp.int32),
        ]
    )
    return state, stats
