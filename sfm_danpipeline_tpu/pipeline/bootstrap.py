"""Baseline pair selection + two-view bootstrap.

Replaces `findBestPair` + `baseReconstruction` (src/Sfm.cpp:408-585).

Reference semantics: match all C(N,2) pairs, keep pairs with >= 120
ratio-test matches, score each by essential-matrix pose-inlier ratio
(src/Sfm.cpp:563-569), then reconstruct from the winning pair. Note: the
reference iterates its std::map ascending and takes the FIRST surviving
candidate — i.e. the LOWEST ratio (src/Sfm.cpp:420,489) — an ordering bug;
we take the argmax and document the divergence (SURVEY.md §7 non-goals).

TPU formulation: matching is batched over the pair axis (HOT LOOP #1,
src/Sfm.cpp:509-583); pair *scoring* reuses one compiled single-pair
RANSAC program from a host loop (see score_pairs docstring).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.ops.epipolar import estimate_relative_pose
from sfm_danpipeline_tpu.ops.matching import PairMatches
from sfm_danpipeline_tpu.ops.projection import undistort_points
from sfm_danpipeline_tpu.ops.triangulation import triangulate_and_filter
from sfm_danpipeline_tpu.pipeline.tracks import (
    ReconstructionState,
    add_points,
)
import dataclasses


class PairScores(NamedTuple):
    pose_inlier_ratio: jnp.ndarray  # (NP,)
    n_matches: jnp.ndarray  # (NP,)
    usable: jnp.ndarray  # (NP,) >= min_pair_matches, pose ok, not planar
    h_over_e: jnp.ndarray  # (NP,) homography/essential inlier ratio
    # BOTH basin-diverse relative-pose candidates per edge (camera i ->
    # camera j) with per-basin inlier support — the pose-graph edges the
    # global re-initializer consumes (ops/rotavg.py). Narrow-FOV data
    # makes single-candidate relative rotations wrong-basin on a large
    # fraction of edges (measured ~35% on a synthetic ring); the
    # initializer disambiguates each edge against the current incremental
    # estimate, which is locally accurate even when globally drifted.
    R_rel: jnp.ndarray  # (NP, 2, 3, 3)
    t_rel: jnp.ndarray  # (NP, 2, 3) unit-scale relative translations
    n_inliers: jnp.ndarray  # (NP, 2)


def _score_one_pair_core(
    key: jax.Array,
    m: PairMatches,
    pa: jnp.ndarray,
    pb: jnp.ndarray,
    K: jnp.ndarray,
    dist: jnp.ndarray,
    image_max_dim: jnp.ndarray,
    config: PipelineConfig,
):
    from sfm_danpipeline_tpu.ops.epipolar import (
        estimate_relative_pose_basins,
    )
    from sfm_danpipeline_tpu.ops.homography import homography_ransac

    x1 = undistort_points(pa, K, dist)
    x2 = undistort_points(pb, K, dist)
    k_e, k_h = jax.random.split(key)
    # Both basin candidates; candidate 0 IS estimate_relative_pose's
    # answer (ops/epipolar.py), so scoring semantics are unchanged while
    # the alternative basin rides along for the pose-graph initializer.
    basins = estimate_relative_pose_basins(
        k_e,
        x1,
        x2,
        m.valid,
        focal=K[0, 0],
        threshold_px=config.geometry.essential_threshold_px,
        n_hypotheses=config.geometry.essential_ransac_iters,
    )
    pose = jax.tree_util.tree_map(lambda a: a[0], basins)
    # Homography check (the reference's findHomographyInliers in pair
    # scoring, src/Sfm.cpp:545,667-689, threshold 0.004*maxdim): when H
    # explains ~as many matches as E, the pair is degenerate for epipolar
    # initialization (planar scene or rotation-only motion — E is then
    # unconstrained and the recovered pose is noise). COLMAP applies the
    # same H/E gate to its init pair.
    _, _, n_h = homography_ransac(
        k_h, pa, pb, m.valid,
        threshold=config.geometry.homography_threshold_factor
        * image_max_dim,
        n_hypotheses=config.geometry.homography_ransac_iters,
    )
    n = jnp.sum(m.valid)
    ratio = pose.n_inliers / jnp.maximum(n, 1)
    h_over_e = n_h / jnp.maximum(pose.n_inliers, 1)
    planar = h_over_e > config.geometry.max_seed_h_over_e
    usable = (n >= config.matching.min_pair_matches) & pose.ok & ~planar
    return ratio, n, usable, h_over_e, basins.R, basins.t, basins.n_inliers


_score_one_pair = jax.jit(_score_one_pair_core, static_argnames=("config",))


@functools.partial(jax.jit, static_argnames=("config",))
def score_pairs(
    key: jax.Array,
    matches: PairMatches,  # batched over pairs (leading dim NP)
    keypoints_xy: jnp.ndarray,  # (V, K, 2)
    pair_i: jnp.ndarray,
    pair_j: jnp.ndarray,
    K: jnp.ndarray,
    dist: jnp.ndarray,
    image_max_dim: jnp.ndarray,
    config: PipelineConfig,
) -> PairScores:
    """Score all pairs by pose-inlier ratio — ONE device dispatch.

    `lax.scan` over the pair axis: the RANSAC body compiles once (vmapping
    the full RANSAC+refinement graph over pairs multiplied XLA compile cost
    into tens of minutes on the TPU remote compiler), and unlike a host
    loop there are no per-pair dispatch+transfer round-trips — those
    dominated the baseline stage (~1 s/pair through the axon tunnel).
    Sub-gate pairs (<120 matches, src/Sfm.cpp:533) ride along masked rather
    than branching: 45 thin RANSACs are cheaper than 45 round-trips.
    """
    NP = int(pair_i.shape[0])
    keys = jax.random.split(key, NP)

    def body(_, inp):
        k, m, i, j = inp
        pa = keypoints_xy[i, m.idx_a]
        pb = keypoints_xy[j, m.idx_b]
        ratio, n, usable, h_over_e, R_rel, t_rel, n_inl = (
            _score_one_pair_core(
                k, m, pa, pb, K, dist, image_max_dim, config
            )
        )
        return None, (
            ratio, n.astype(jnp.int32), usable, h_over_e, R_rel, t_rel,
            n_inl.astype(jnp.int32),
        )

    _, (ratios, ns, usables, h_over_e, R_rel, t_rel, n_inl) = jax.lax.scan(
        body, None, (keys, matches, pair_i, pair_j)
    )
    return PairScores(
        pose_inlier_ratio=jnp.where(usables, ratios, -1.0),
        n_matches=ns,
        usable=usables,
        h_over_e=h_over_e,
        R_rel=R_rel,
        t_rel=t_rel,
        n_inliers=n_inl,
    )


def best_pair(scores: PairScores) -> jnp.ndarray:
    """Argmax pose-inlier ratio among usable pairs (divergence from the
    reference's ascending-map first-hit, documented above)."""
    return jnp.argmax(scores.pose_inlier_ratio)


@functools.partial(jax.jit, static_argnames=("config",))
def bootstrap_pair(
    key: jax.Array,
    state: ReconstructionState,
    matches: PairMatches,  # matches of ONE pair
    keypoints_xy: jnp.ndarray,  # (V, K, 2)
    colors: jnp.ndarray,  # (V, K, 3) per-keypoint RGB samples
    view_i: jnp.ndarray,
    view_j: jnp.ndarray,
    K: jnp.ndarray,
    dist: jnp.ndarray,
    config: PipelineConfig,
    basin: jnp.ndarray | int = 0,
) -> Tuple[ReconstructionState, jnp.ndarray, jnp.ndarray]:
    """Two-view reconstruction seeding the map (src/Sfm.cpp:420-489):
    P_left = I anchored at view_i, pose from the essential matrix,
    triangulate pose inliers, 6 px reprojection gate, insert with tracks.

    `basin` (0 or 1, traced) selects which of the two basin-diverse pose
    interpretations to reconstruct (ops/epipolar.py
    estimate_relative_pose_basins); the host tries basin 0 first and falls
    back to 1 when the component cannot be validated by a third view.

    Returns (state, ok, med_angle_deg). ok additionally requires the median
    triangulation angle of accepted points to exceed
    config.geometry.min_seed_triangulation_angle_deg — a spurious
    near-pure-translation interpretation triangulates a cone of rays with
    ~0.1 deg parallax, and seeding from it poisons every downstream stage
    (PnP, Sim(3) merge). The reference has no such guard and silently
    corrupts its map on low-parallax pairs.
    """
    from sfm_danpipeline_tpu.ops.epipolar import (
        estimate_relative_pose_basins,
    )

    pa = keypoints_xy[view_i, matches.idx_a]
    pb = keypoints_xy[view_j, matches.idx_b]
    x1 = undistort_points(pa, K, dist)
    x2 = undistort_points(pb, K, dist)
    poses = estimate_relative_pose_basins(
        key,
        x1,
        x2,
        matches.valid,
        focal=K[0, 0],
        threshold_px=config.geometry.essential_threshold_px,
        n_hypotheses=config.geometry.essential_ransac_iters,
    )
    basin = jnp.asarray(basin, jnp.int32)
    pose = jax.tree_util.tree_map(lambda a: a[basin], poses)
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    X, keep = triangulate_and_filter(
        eye,
        zero,
        pose.R,
        pose.t,
        x1,
        x2,
        pa,
        pb,
        K,
        matches.valid & pose.inliers,
        max_error_px=config.geometry.max_reprojection_error_px,
    )
    from sfm_danpipeline_tpu.ops.lie import log_so3

    cam_i = jnp.zeros(6)
    cam_j = jnp.concatenate([log_so3(pose.R), pose.t])
    cameras = state.cameras.at[view_i].set(cam_i).at[view_j].set(cam_j)
    camera_valid = state.camera_valid.at[view_i].set(True).at[view_j].set(True)
    state = dataclasses.replace(
        state, cameras=cameras, camera_valid=camera_valid
    )
    rgb = colors[view_i, matches.idx_a]
    state = add_points(
        state,
        X,
        rgb,
        view_i,
        matches.idx_a,
        view_j,
        matches.idx_b,
        keep,
        merge_distance=config.geometry.merge_distance,
    )
    # Median triangulation angle (deg) of accepted points: the angle between
    # the two observation rays. Masked median via sort-with-sentinel.
    C2 = -pose.R.T @ pose.t
    r1 = X / (jnp.linalg.norm(X, axis=-1, keepdims=True) + 1e-12)
    d2 = X - C2
    r2 = d2 / (jnp.linalg.norm(d2, axis=-1, keepdims=True) + 1e-12)
    ang = jnp.degrees(
        jnp.arccos(jnp.clip(jnp.sum(r1 * r2, axis=-1), -1.0, 1.0))
    )
    n_keep = jnp.sum(keep)
    med_idx = jnp.clip((n_keep - 1) // 2, 0)
    med_angle = jnp.sort(jnp.where(keep, ang, jnp.inf))[med_idx]
    med_angle = jnp.where(n_keep > 0, med_angle, 0.0)
    ok = (
        pose.ok
        & (n_keep >= config.geometry.min_pose_points)
        & (med_angle >= config.geometry.min_seed_triangulation_angle_deg)
    )
    return state, ok, med_angle
