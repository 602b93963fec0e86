"""Incremental view registration: PnP + triangulation against done views.

Replaces `addMoreViews`/`findCameraPosePNP` + the per-view triangulate/merge
loop (src/Sfm.cpp:893-1210). Each step is a jitted, fixed-shape computation;
the frontier walk stays on the host (SURVEY.md §7 hard part #3).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.ops.lie import exp_so3, log_so3
from sfm_danpipeline_tpu.ops.matching import PairMatches
from sfm_danpipeline_tpu.ops.pnp import solve_pnp_ransac
from sfm_danpipeline_tpu.ops.projection import undistort_points
from sfm_danpipeline_tpu.ops.triangulation import triangulate_and_filter
from sfm_danpipeline_tpu.pipeline.tracks import (
    ReconstructionState,
    add_points,
    find_2d3d,
)


def _epipolar_filter_core(
    key: jax.Array,
    pn: jnp.ndarray,  # (M, 2) new-view pixel positions of matches
    pd: jnp.ndarray,  # (M, 2) done-view pixel positions
    valid: jnp.ndarray,  # (M,)
    K: jnp.ndarray,
    dist: jnp.ndarray,
    config: PipelineConfig,
) -> jnp.ndarray:
    """Prune one view pair's matches to their two-view epipolar consensus.

    The reference prunes matches with a homography at 2.5 px before use
    (prunedMatchingWithHomography, src/Sfm.cpp:610-662); the essential
    matrix band is the correct non-planar analogue. Falls back to the raw
    matches when the pair is too thin to fit a model.
    """
    from sfm_danpipeline_tpu.ops.epipolar import estimate_relative_pose

    xn = undistort_points(pn, K, dist)
    xd = undistort_points(pd, K, dist)
    pose = estimate_relative_pose(
        key, xn, xd, valid, focal=K[0, 0],
        threshold_px=config.geometry.essential_threshold_px,
        n_hypotheses=config.geometry.prefilter_ransac_iters,
    )
    n = jnp.sum(valid)
    # Credibility gate: apply the consensus only when it explains a solid
    # fraction of the matches. On wide-baseline bridge pairs (~5-10% true
    # inliers) an 8-point RANSAC essentially never draws a clean sample
    # (0.1^8); its "consensus" is junk that would prune the TRUE matches
    # and starve bridge PnP (measured: view-8 2D-3D support 278 -> 46
    # when ungated). Below the bar the raw matches pass through — PnP's
    # P3P minimal draws are the tool that works at those rates.
    frac_ok = pose.n_inliers >= 0.3 * n
    use = pose.ok & (n >= 2 * config.geometry.min_pose_points) & frac_ok
    return jnp.where(use, valid & pose.inliers, valid)


epipolar_filter_matches = jax.jit(
    _epipolar_filter_core, static_argnames=("config",)
)


@functools.partial(jax.jit, static_argnames=("config", "n_views"))
def epipolar_prefilter_table(
    key: jax.Array,
    idx_a: jnp.ndarray,  # (P, M) loose-match feature ids in view pair_i
    idx_b: jnp.ndarray,  # (P, M)
    valid: jnp.ndarray,  # (P, M)
    keypoints_xy: jnp.ndarray,  # (V, K, 2)
    pair_i: jnp.ndarray,  # (P,)
    pair_j: jnp.ndarray,  # (P,)
    K: jnp.ndarray,
    dist: jnp.ndarray,
    config: PipelineConfig,
    n_views: int,
) -> jnp.ndarray:
    """Two-view epipolar consensus for EVERY pair, batched in one dispatch.

    The per-view registration prefilter (_epipolar_filter_core) depends
    only on the match tables — not on reconstruction state — so running it
    per (new_view, done_view) inside every registration re-derived the
    same consensus D times per view, serially (a lax.scan of 128-hypothesis
    8-point RANSACs was the incremental stage's dominant compute,
    ROUND3_NOTES r3: ~340 ms/view). Here all P pairs RANSAC at once
    (vmapped: one batched eigh instead of P*D sequential ones) and the
    result scatters into the oriented (V, V, M) validity table that
    register_view consumes directly.

    Reference analogue: prunedMatchingWithHomography applied before use
    (src/Sfm.cpp:610-662,725), hoisted out of the loop.
    """
    P = pair_i.shape[0]

    def one(k, ia, ib, v, i, j):
        pn = keypoints_xy[i, ia]
        pd = keypoints_xy[j, ib]
        return _epipolar_filter_core(k, pn, pd, v, K, dist, config)

    # Chunked batching: vmap within fixed-size chunks, lax.map across
    # them. A flat vmap over all pairs scales the compiled graph with
    # O(V^2) and crashed the TPU compiler at 1225 pairs (V=50 ring); the
    # chunked form compiles one 64-wide RANSAC body regardless of V.
    C = min(64, P)
    padP = (-P) % C
    pi_p = jnp.pad(pair_i, (0, padP))  # dummies land on the (0, 0) diag,
    pj_p = jnp.pad(pair_j, (0, padP))  # which no (new, done) read touches
    ia_p = jnp.pad(idx_a, ((0, padP), (0, 0)))
    ib_p = jnp.pad(idx_b, ((0, padP), (0, 0)))
    v_p = jnp.pad(valid, ((0, padP), (0, 0)))
    keys = jax.random.split(key, P + padP)
    nch = (P + padP) // C

    def chunk(args):
        return jax.vmap(one)(*args)

    filt = jax.lax.map(
        chunk,
        tuple(
            a.reshape((nch, C) + a.shape[1:])
            for a in (keys, ia_p, ib_p, v_p, pi_p, pj_p)
        ),
    ).reshape(P + padP, -1)
    out = jnp.zeros((n_views, n_views, idx_a.shape[1]), bool)
    out = out.at[pi_p, pj_p].set(filt)
    out = out.at[pj_p, pi_p].set(filt)
    return out


def build_match_tables(
    matches: PairMatches,
    pair_i: jnp.ndarray,  # (P,) int32
    pair_j: jnp.ndarray,  # (P,)
    n_views: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter the pair-list matches into dense oriented (V, V, M) tables so
    every later gather happens on-device: feat_tab_a[a, b] holds the
    matched feature ids *in view a* for pair (a, b), for both orientations.
    Replaces per-pair host transfers in the incremental loop (each
    `np.asarray(matches.idx_a[p])` was a device->host round-trip through
    the axon tunnel)."""
    V, M = n_views, matches.idx_a.shape[1]
    feat_a = jnp.zeros((V, V, M), jnp.int32)
    feat_a = feat_a.at[pair_i, pair_j].set(matches.idx_a)
    feat_a = feat_a.at[pair_j, pair_i].set(matches.idx_b)
    feat_b = jnp.zeros((V, V, M), jnp.int32)
    feat_b = feat_b.at[pair_i, pair_j].set(matches.idx_b)
    feat_b = feat_b.at[pair_j, pair_i].set(matches.idx_a)
    valid = jnp.zeros((V, V, M), bool)
    valid = valid.at[pair_i, pair_j].set(matches.valid)
    valid = valid.at[pair_j, pair_i].set(matches.valid)
    return feat_a, feat_b, valid


@functools.partial(jax.jit, static_argnames=("config",))
def register_view(
    key: jax.Array,
    state: ReconstructionState,
    new_view: jnp.ndarray,
    done_views: jnp.ndarray,  # (D,) int32 view ids (padded with -1)
    feat_tab_a: jnp.ndarray,  # (V, V, M) oriented match tables
    feat_tab_b: jnp.ndarray,
    valid_tab: jnp.ndarray,
    keypoints_xy: jnp.ndarray,  # (V, K, 2)
    K: jnp.ndarray,
    dist: jnp.ndarray,
    image_max_dim: float,
    config: PipelineConfig,
    valid_tab_strict: jnp.ndarray | None = None,
) -> Tuple[ReconstructionState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PnP-register `new_view` from 2D-3D correspondences through the track
    table (src/Sfm.cpp:946-961). Returns (state, ok, n_inliers, n_support)
    where n_support is the 2D-3D correspondence count PnP had to work with
    (the starvation diagnostic for views past a viewpoint break).

    `valid_tab` must be the EPIPOLAR-PREFILTERED loose table
    (epipolar_prefilter_table): at wide baselines the raw ratio-test match
    sets run >50% outliers and unfiltered PnP starves. The consensus
    depends only on the match tables, so it is computed once for all pairs
    up front — not re-derived per registration (the r3 form ran a
    lax.scan of per-done-view RANSACs here, the incremental stage's
    dominant compute).
    """
    dv_c = jnp.clip(done_views, 0)
    match_feat_new = feat_tab_a[new_view, dv_c]  # (D, M)
    match_feat_done = feat_tab_b[new_view, dv_c]
    match_valid = valid_tab[new_view, dv_c] & (done_views >= 0)[:, None]
    D, M = match_feat_new.shape

    def collect(d_idx, vtab):
        dv = done_views[d_idx]
        p, fnew, m = find_2d3d(
            state,
            new_view,
            jnp.clip(dv, 0),
            match_feat_new[d_idx],
            match_feat_done[d_idx],
            vtab[d_idx] & (dv >= 0),
        )
        return p, fnew, m

    p, fnew, m = jax.vmap(collect, in_axes=(0, None))(
        jnp.arange(D), match_valid
    )
    p = p.reshape(-1)
    fnew = fnew.reshape(-1)
    m = m.reshape(-1)
    if valid_tab_strict is not None:
        sv = valid_tab_strict[new_view, dv_c] & (done_views >= 0)[:, None]
        _, _, m_strict = jax.vmap(collect, in_axes=(0, None))(
            jnp.arange(D), sv
        )
        m_strict = m_strict.reshape(-1)
    else:
        m_strict = jnp.zeros_like(m)
    # Deduplicate: a cloud point may be hit via several done views — keep
    # ONE representative per point id via a scatter-max (the max sorted
    # index wins). Sort so STRICT rows carry the highest indices among a
    # point's duplicates: the surviving representative is then the strict
    # one whenever a strict observation exists, which is what keeps the
    # P3P strict-sampling pool (sample_mask below) populated — with
    # loose-wins dedup the strict rows were masked out and bridge views
    # lost their clean minimal-sample pool.
    order = jnp.argsort((~m) * 2 + (m & m_strict), stable=True)
    p_s = p[order]
    fnew_s = fnew[order]
    m_s = m[order]
    strict_s = m_strict[order]
    seen_slot = jnp.full((state.capacity,), -1, jnp.int32)
    idx = jnp.arange(p_s.shape[0], dtype=jnp.int32)
    seen_slot = seen_slot.at[jnp.where(m_s, p_s, state.capacity - 1)].max(
        jnp.where(m_s, idx, -1)
    )
    # Wait-free dedup: entry i survives if seen_slot[p_i] == i (max wins) —
    # "last wins" is fine; any single representative per point works.
    keep = m_s & (seen_slot[p_s] == idx)

    X = state.points_xyz[p_s]
    px = keypoints_xy[new_view, fnew_s]
    xn = undistort_points(px, K, dist)
    thr = config.geometry.pnp_threshold_factor * image_max_dim
    res = solve_pnp_ransac(
        key,
        X,
        px,
        xn,
        keep,
        K,
        threshold_px=thr,
        n_hypotheses=config.geometry.pnp_ransac_iters,
        max_translation=config.geometry.pnp_max_translation,
        min_inliers=config.geometry.pnp_min_inliers,
        sample_mask=keep & strict_s,
    )
    cam = jnp.concatenate([log_so3(res.R), res.t])
    cameras = jnp.where(
        res.ok, state.cameras.at[new_view].set(cam), state.cameras
    )
    camera_valid = jnp.where(
        res.ok,
        state.camera_valid.at[new_view].set(True),
        state.camera_valid,
    )
    state = dataclasses.replace(
        state, cameras=cameras, camera_valid=camera_valid
    )
    return state, res.ok, res.n_inliers, jnp.sum(keep)


@functools.partial(jax.jit, static_argnames=("config",))
def register_and_triangulate(
    key: jax.Array,
    state: ReconstructionState,
    new_view: jnp.ndarray,
    done_views: jnp.ndarray,
    feat_tab_a: jnp.ndarray,
    feat_tab_b: jnp.ndarray,
    valid_tab_loose: jnp.ndarray,
    valid_tab_strict: jnp.ndarray,
    keypoints_xy: jnp.ndarray,
    colors: jnp.ndarray,
    K: jnp.ndarray,
    dist: jnp.ndarray,
    image_max_dim: float,
    config: PipelineConfig,
) -> Tuple[ReconstructionState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused per-view step: PnP registration, and — when it succeeds —
    triangulation against every done view, in a single device dispatch.

    The split register/triangulate pair costs two tunnel round-trips per
    view plus a host sync between them; fusing them halves the per-view
    dispatch latency of the incremental loop (the reference's inner loop,
    src/Sfm.cpp:933-996).

    Returns (state, stats) with stats an int32[5] vector
    [ok, n_inliers, n_support, n_points_after, n_obs_after]: ONE packed
    host fetch instead of five scalar round-trips — each scalar fetch is a
    full tunnel RTT on the remote-TPU backend, and the per-view RTTs (not
    compute) dominated the incremental stage (r3 measurement: ~0.67 s/view
    of which compute is milliseconds).
    """
    state, ok, n_inl, n_support = register_view(
        key, state, new_view, done_views, feat_tab_a, feat_tab_b,
        valid_tab_loose, keypoints_xy, K, dist, image_max_dim, config,
        valid_tab_strict=valid_tab_strict,
    )

    def tri(st):
        st2, _ = triangulate_new_view_all(
            st, new_view, done_views, feat_tab_a, feat_tab_b,
            valid_tab_strict, keypoints_xy, colors, K, dist, config,
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
            n_support.astype(jnp.int32),
            state.n_points.astype(jnp.int32),
            n_obs.astype(jnp.int32),
        ]
    )
    return state, stats


@functools.partial(jax.jit, static_argnames=("config",))
def triangulate_new_view_all(
    state: ReconstructionState,
    new_view: jnp.ndarray,
    done_views: jnp.ndarray,  # (D,) view ids, -1 = padding
    feat_tab_a: jnp.ndarray,  # (V, V, M) oriented match tables
    feat_tab_b: jnp.ndarray,
    valid_tab: jnp.ndarray,
    keypoints_xy: jnp.ndarray,
    colors: jnp.ndarray,
    K: jnp.ndarray,
    dist: jnp.ndarray,
    config: PipelineConfig,
) -> Tuple[ReconstructionState, jnp.ndarray]:
    """Triangulate the new view against EVERY done view in one jit
    (lax.scan over the done axis — the reference's per-good-view loop,
    src/Sfm.cpp:964-993, without one device dispatch per view)."""

    def body(st, d):
        dv = jnp.clip(done_views[d], 0)
        st, n = triangulate_new_view(
            st,
            new_view,
            dv,
            feat_tab_a[new_view, dv],
            feat_tab_b[new_view, dv],
            valid_tab[new_view, dv] & (done_views[d] >= 0),
            keypoints_xy,
            colors,
            K,
            dist,
            config,
        )
        return st, n

    state, ns = jax.lax.scan(body, state, jnp.arange(done_views.shape[0]))
    return state, jnp.sum(ns)


@functools.partial(jax.jit, static_argnames=("config",))
def triangulate_new_view(
    state: ReconstructionState,
    new_view: jnp.ndarray,
    done_view: jnp.ndarray,
    feat_new: jnp.ndarray,  # (M,)
    feat_done: jnp.ndarray,  # (M,)
    valid: jnp.ndarray,  # (M,)
    keypoints_xy: jnp.ndarray,
    colors: jnp.ndarray,  # (V, K, 3)
    K: jnp.ndarray,
    dist: jnp.ndarray,
    config: PipelineConfig,
) -> Tuple[ReconstructionState, jnp.ndarray]:
    """Triangulate matches (new_view, done_view) with current poses and merge
    into the cloud (src/Sfm.cpp:964-993). Returns (state, n_added_or_fused)."""
    cam_n = state.cameras[new_view]
    cam_d = state.cameras[done_view]
    Rn, tn = exp_so3(cam_n[:3]), cam_n[3:]
    Rd, td = exp_so3(cam_d[:3]), cam_d[3:]
    pn = keypoints_xy[new_view, feat_new]
    pd = keypoints_xy[done_view, feat_done]
    xn = undistort_points(pn, K, dist)
    xd = undistort_points(pd, K, dist)
    X, keep = triangulate_and_filter(
        Rn,
        tn,
        Rd,
        td,
        xn,
        xd,
        pn,
        pd,
        K,
        valid & state.camera_valid[new_view] & state.camera_valid[done_view],
        max_error_px=config.geometry.max_reprojection_error_px,
    )
    rgb = colors[new_view, feat_new]
    state = add_points(
        state,
        X,
        rgb,
        new_view,
        feat_new,
        done_view,
        feat_done,
        keep,
        merge_distance=config.geometry.merge_distance,
    )
    return state, jnp.sum(keep)
