"""Essential-matrix estimation and relative-pose recovery.

Replaces cv::findEssentialMat (RANSAC, p=0.999, thr=1.0 px;
src/Sfm.cpp:542,743) and cv::recoverPose + CheckCoherentRotation
(src/Sfm.cpp:755-799). TPU formulation: the 8-point algorithm fit inside a
vmapped fixed-budget RANSAC, Sampson-distance scoring, a least-squares
refit on the winning inlier set, and cheirality-based disambiguation of the
four (R, t) decompositions — all batched jnp, no per-sample control flow.

Note vs reference: OpenCV uses Nister's 5-point solver; we use the 8-point
algorithm on normalized coordinates. With RANSAC over hundreds of samples
and >=120-match pairs the recovered pose is equivalent in practice (tests
assert pose recovery to ground truth on synthetic scenes and temple).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.ops.ransac import ransac
from sfm_danpipeline_tpu.ops.triangulation import triangulate_dlt, pose_matrix


class RelativePose(NamedTuple):
    R: jnp.ndarray  # (3, 3) world(cam1)->cam2
    t: jnp.ndarray  # (3,) unit-norm baseline
    E: jnp.ndarray  # (3, 3) essential matrix
    inliers: jnp.ndarray  # (M,) bool — pose (epipolar) inliers
    n_inliers: jnp.ndarray  # scalar int
    ok: jnp.ndarray  # scalar bool — rotation coherent & enough support


def _hartley_transform(
    x: jnp.ndarray, w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted Hartley normalization: similarity T s.t. T x has zero mean
    and ~sqrt(2) RMS radius. Essential for f32: calibrated coords (~0.15)
    make the DLT monomial columns span 0.02..1.0 and eigh(A^T A) loses the
    null vector (observed: RANSAC pose unstable across seeds)."""
    wsum = jnp.sum(w) + 1e-12
    mean = jnp.sum(x * w[:, None], axis=0) / wsum
    rms = jnp.sqrt(jnp.sum(w * jnp.sum((x - mean) ** 2, -1)) / wsum) + 1e-12
    s = jnp.sqrt(2.0) / rms
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return (x - mean) * s, T


def _fit_essential_dlt(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Weighted normalized-8-point essential fit on >= 8 correspondences.

    Hartley-normalizes both point sets, solves the DLT null vector via
    eigh(A^T A), denormalizes (T2^T F T1 — inputs are calibrated coords, so
    the denormalized F *is* E up to noise), then projects onto the essential
    manifold (singular values (s, s, 0))."""
    n1, T1 = _hartley_transform(x1, w)
    n2, T2 = _hartley_transform(x2, w)
    u1, v1 = n1[:, 0], n1[:, 1]
    u2, v2 = n2[:, 0], n2[:, 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )
    Aw = A * w[:, None]
    _, V = jnp.linalg.eigh(Aw.T @ Aw)
    F = V[:, 0].reshape(3, 3)
    E = T2.T @ F @ T1
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[0] + S[1]) * 0.5
    return (U * jnp.array([s, s, 0.0])) @ Vt


def _essential_from_eight(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Minimal 8-point fit (x1, x2: (8, 2) calibrated coords)."""
    return _fit_essential_dlt(x1, x2, jnp.ones(x1.shape[0], x1.dtype))


def essential_from_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """E = [t]x R."""
    t_hat = jnp.array(
        [
            [0.0, -t[2], t[1]],
            [t[2], 0.0, -t[0]],
            [-t[1], t[0], 0.0],
        ]
    )
    return t_hat @ R


def _refine_pose_sampson(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    w: jnp.ndarray,
    iters: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton on (angle-axis, t) minimizing weighted Sampson distance.

    The algebraic DLT refit is unusable on narrow baselines (its algebraic
    cost diverges from the geometric one; observed 5x Sampson blow-up on
    temple pairs), so the polish happens in pose space. t is renormalized
    each step; the scale gauge is handled by LM damping.
    """
    from sfm_danpipeline_tpu.ops.lie import exp_so3, log_so3

    params0 = jnp.concatenate([log_so3(R0), t0])

    def resid(p):
        R = exp_so3(p[:3])
        t = p[3:]
        t = t / (jnp.linalg.norm(t) + 1e-12)
        E = essential_from_pose(R, t)
        return jnp.sqrt(sampson_distance(E, x1, x2) + 1e-18) * w

    jac = jax.jacfwd(resid)

    def step(p, _):
        r = resid(p)
        J = jac(p)
        H = J.T @ J + 1e-8 * jnp.eye(6)
        g = J.T @ r
        delta = jnp.linalg.solve(H, g)
        new = p - delta
        better = jnp.sum(resid(new) ** 2) < jnp.sum(r**2)
        return jnp.where(better, new, p), None

    p, _ = jax.lax.scan(step, params0, None, length=iters)
    R = exp_so3(p[:3])
    t = p[3:] / (jnp.linalg.norm(p[3:]) + 1e-12)
    return R, t


def sampson_distance(
    E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    """First-order epipolar distance in normalized coords. x: (M, 2)."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    Ex1 = h1 @ E.T  # (M, 3)
    Etx2 = h2 @ E  # (M, 3)
    num = jnp.sum(h2 * Ex1, axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def decompose_essential(
    E: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Four candidate (R, t): returns Rs (4,3,3), ts (4,3)."""
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _cheirality_counts(
    Rs: jnp.ndarray,
    ts: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per candidate: (near-in-front count, plain in-front count).

    The near gate (recoverPose's distanceThresh analogue, default 50 in
    OpenCV) is a TIEBREAK only. Narrow-baseline pairs put the whole scene
    beyond 50 baseline units (temple pair (6,7): depth ~100x baseline), so
    the correct pose can have near == 0 while a mirrored pose scatters a
    few spurious triangulations inside the near band — letting near-count
    dominate the ranking selects the WRONG pose on exactly those pairs
    (the round-1 end-of-round regression). Rank by front first, near
    second; quality gates use the plain z>0 count."""
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    P1 = pose_matrix(eye, zero)

    def count(R, t):
        P2 = pose_matrix(R, t)
        X = triangulate_dlt(P1, P2, x1, x2)
        z1 = X[:, 2]
        z2 = X @ R.T[:, 2] + t[2]
        front = (z1 > 0) & (z2 > 0) & mask
        near = jnp.abs(z1) < 50.0
        return jnp.sum(front & near), jnp.sum(front)

    return jax.vmap(count)(Rs, ts)


def rotation_angle_between(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (radians) between two rotations."""
    c = (jnp.trace(Ra @ Rb.T) - 1.0) * 0.5
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


# Basin separation (radians): two poses whose rotations differ by more than
# this are treated as distinct interpretations of the epipolar geometry.
# Narrow-FOV turntable pairs (the temple set: ~12 deg of object on a
# f=1520px/640px sensor) admit TWO Sampson-near-equivalent interpretations —
# the true one (R ~ 5 deg, scene at ~12 baselines) and a spurious
# near-pure-translation one (R ~ 0.5 deg, scene at ~300 baselines, a cone of
# rays). Pairwise scores CANNOT reliably rank them (measured on temple pair
# (6,7): the wrong basin wins MSAC with every key); disambiguation needs a
# third view, so the estimator exposes both basins to the caller.
_BASIN_SEP = 0.035  # ~2 degrees


def _pose_search(
    key, x1, x2, valid, refit_n2, n_hypotheses, n_alternatives=64
):
    """Shared RANSAC head: hypotheses, MSAC scores, cheirality-ranked winner,
    Sampson polish with cheirality acceptance — plus the raw model pool for
    basin mining. Returns a dict of intermediates."""

    def fit(idx):
        return _essential_from_eight(x1[idx], x2[idx])

    def residuals(E):
        return sampson_distance(E, x1, x2)

    # MSAC over all hypotheses, but model selection is cheirality-aware:
    # on narrow baselines several ambiguous essential matrices explain the
    # matches to ~1 px Sampson while triangulating points BEHIND the
    # cameras. Take the top-T truncated-loss hypotheses, decompose each,
    # count in-front points, and select by (front count, then MSAC score).
    from sfm_danpipeline_tpu.ops.ransac import sample_indices

    idx = sample_indices(key, valid, n_hypotheses, 8)
    models = jax.vmap(fit)(idx)
    res = jax.vmap(residuals)(models)
    res = jnp.where(valid[None, :], res, 0.0)
    scores = jnp.sum(jnp.minimum(res, refit_n2), axis=-1)
    T = 8
    _, top = jax.lax.top_k(-scores, T)

    M1 = x1.shape[0] + 1  # lexicographic rank base: front-count dominates

    def eval_candidate(E_h, band_h):
        Rs_h, ts_h = decompose_essential(E_h)
        near_h, front_h = _cheirality_counts(Rs_h, ts_h, x1, x2, band_h)
        rank_h = front_h * M1 + near_h
        b = jnp.argmax(rank_h)
        return rank_h[b], front_h[b], Rs_h[b], ts_h[b]

    bands_t = (res[top] < refit_n2) & valid[None, :]
    ranks, fronts, Rs_c, ts_c = jax.vmap(eval_candidate)(
        models[top], bands_t
    )
    pick = jnp.argmax(ranks)
    R0, t0 = Rs_c[pick], ts_c[pick]
    band0 = bands_t[pick]
    unref_front0 = fronts[pick]

    R, t, band = R0, t0, band0
    for _ in range(2):
        R, t = _refine_pose_sampson(R, t, x1, x2, band.astype(x1.dtype))
        E = essential_from_pose(R, t)
        band = (sampson_distance(E, x1, x2) < refit_n2) & valid
    # Sampson depends only on E, and on narrow baselines the ambiguity
    # surface has low-Sampson minima whose points triangulate BEHIND the
    # cameras. Re-decompose the refined E, re-select by cheirality, and
    # keep the refined pose only if it beats the unrefined one on
    # (in-front count, inlier count) — never worse than the MSAC model.
    E = essential_from_pose(R, t)
    Rs2, ts2 = decompose_essential(E)
    near2, front2 = _cheirality_counts(Rs2, ts2, x1, x2, band)
    best2 = jnp.argmax(front2 * M1 + near2)
    refined_front = front2[best2]
    n_ref = jnp.sum(band)
    # Accept the refinement only when its in-front fraction is healthy.
    use_refined = refined_front >= (n_ref + 1) // 2
    R_a = jnp.where(use_refined, Rs2[best2], R0)
    t_a = jnp.where(use_refined, ts2[best2], t0)
    band_a = jnp.where(use_refined, band, band0)
    front_a = jnp.where(use_refined, refined_front, unref_front0)
    return dict(
        models=models, scores=scores, res=res, M1=M1,
        R0=R0, t0=t0, band0=band0, front0=unref_front0,
        R=R_a, t=t_a, band=band_a, front=front_a,
        eval_candidate=eval_candidate,
    )


def _finish(R, t, band, front, min_points):
    E = essential_from_pose(R, t)
    n_in = jnp.sum(band)
    det_ok = jnp.abs(jnp.abs(jnp.linalg.det(R)) - 1.0) < 1e-4
    ok = det_ok & (n_in >= min_points) & (front >= n_in // 2)
    return RelativePose(
        R=R, t=t, E=E, inliers=band, n_inliers=n_in, ok=ok
    )


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "min_points"))
def estimate_relative_pose(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    focal: float | jnp.ndarray,
    threshold_px: float = 1.0,
    n_hypotheses: int = 512,
    min_points: int = 8,
) -> RelativePose:
    """Full two-view pose: RANSAC essential + refit + cheirality recoverPose.

    x1, x2: (M, 2) *normalized* coordinates; valid: (M,) match mask; focal
    converts the pixel threshold into normalized units (thr_n = thr_px / f,
    matching cv::findEssentialMat's internal normalization of its 1.0 px
    threshold, src/Sfm.cpp:542).
    """
    # Refit on a widened consensus band (LO-RANSAC style): real SIFT matches
    # drift 1-2 px under viewpoint change, so the strict 1 px consensus set
    # is small (~tens) and a refit on it alone is noisy. Scoring stays at the
    # reference's 1 px (model selection), the least-squares polish uses the
    # 2.5x band (~hundreds of matches) for a stable E.
    refit_n2 = (2.5 * threshold_px / focal) ** 2
    s = _pose_search(key, x1, x2, valid, refit_n2, n_hypotheses)
    return _finish(s["R"], s["t"], s["band"], s["front"], min_points)


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "min_points"))
def estimate_relative_pose_basins(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    focal: float | jnp.ndarray,
    threshold_px: float = 1.0,
    n_hypotheses: int = 512,
    min_points: int = 8,
) -> RelativePose:
    """Two basin-diverse pose candidates, stacked on a leading axis (2, ...).

    Candidate 0 is `estimate_relative_pose`'s answer. Candidate 1 is the
    best pose whose rotation lies in a DIFFERENT basin (geodesic distance
    > ~2 deg from candidate 0): if the Sampson polish jumped basins, the
    unpolished RANSAC winner; otherwise the best-MSAC alternative among the
    hypothesis pool, polished with a basin guard (the polish result is kept
    only if it stays in its own basin — the spurious basin often has
    strictly lower Sampson cost, so an unguarded polish would collapse both
    candidates onto it).

    Callers (pipeline/bootstrap.py) disambiguate by third-view support: the
    true interpretation lets another view PnP-register against the
    triangulated cloud; the spurious one (a cone of rays) does not. This is
    capability the reference lacks — cv::recoverPose returns one pose and
    the reference trusts it (src/Sfm.cpp:755), which silently corrupts the
    map on exactly these pairs.
    """
    refit_n2 = (2.5 * threshold_px / focal) ** 2
    s = _pose_search(key, x1, x2, valid, refit_n2, n_hypotheses)
    R_a, t_a = s["R"], s["t"]
    models, scores, res = s["models"], s["scores"], s["res"]

    # --- Candidate B.
    # Did the polish jump basins? Then the pre-polish winner IS basin 2.
    jumped = rotation_angle_between(R_a, s["R0"]) > _BASIN_SEP

    # Mine the hypothesis pool for the best-MSAC model in another basin.
    # Cheap basin test per model: geodesic distance of its two distinct
    # decomposition rotations to R_a (the +-t pairs share rotations).
    def rot_dist(E):
        Rs, _ = decompose_essential(E)
        da = rotation_angle_between(Rs[0], R_a)
        db = rotation_angle_between(Rs[2], R_a)
        return jnp.minimum(da, db)

    A = 8  # alternatives given the full cheirality treatment
    dists = jax.vmap(rot_dist)(models)
    alt_scores = jnp.where(dists > _BASIN_SEP, scores, jnp.inf)
    _, alt_top = jax.lax.top_k(-alt_scores, A)
    bands_alt = (res[alt_top] < refit_n2) & valid[None, :]
    ranks_alt, fronts_alt, Rs_alt, ts_alt = jax.vmap(s["eval_candidate"])(
        models[alt_top], bands_alt
    )
    ranks_alt = jnp.where(
        jnp.isfinite(alt_scores[alt_top]), ranks_alt, -1
    )
    pick_alt = jnp.argmax(ranks_alt)
    has_alt = ranks_alt[pick_alt] >= 0

    R_b0 = jnp.where(jumped, s["R0"], Rs_alt[pick_alt])
    t_b0 = jnp.where(jumped, s["t0"], ts_alt[pick_alt])
    band_b0 = jnp.where(jumped, s["band0"], bands_alt[pick_alt])
    front_b0 = jnp.where(jumped, s["front0"], fronts_alt[pick_alt])
    usable_b = jumped | has_alt

    # Basin-guarded polish of B.
    R_b, t_b, band_b = R_b0, t_b0, band_b0
    for _ in range(2):
        R_b, t_b = _refine_pose_sampson(
            R_b, t_b, x1, x2, band_b.astype(x1.dtype)
        )
        E_b = essential_from_pose(R_b, t_b)
        band_b = (sampson_distance(E_b, x1, x2) < refit_n2) & valid
    stayed = rotation_angle_between(R_b, R_a) > _BASIN_SEP
    Rs_b2, ts_b2 = decompose_essential(essential_from_pose(R_b, t_b))
    near_b2, front_b2 = _cheirality_counts(Rs_b2, ts_b2, x1, x2, band_b)
    best_b2 = jnp.argmax(front_b2 * s["M1"] + near_b2)
    keep_pol = stayed & (front_b2[best_b2] >= (jnp.sum(band_b) + 1) // 2)
    R_b = jnp.where(keep_pol, Rs_b2[best_b2], R_b0)
    t_b = jnp.where(keep_pol, ts_b2[best_b2], t_b0)
    band_b = jnp.where(keep_pol, band_b, band_b0)
    front_b = jnp.where(keep_pol, front_b2[best_b2], front_b0)

    cand_a = _finish(R_a, t_a, s["band"], s["front"], min_points)
    cand_b = _finish(R_b, t_b, band_b, front_b, min_points)
    cand_b = cand_b._replace(ok=cand_b.ok & usable_b)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), cand_a, cand_b
    )
