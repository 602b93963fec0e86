"""Sim(3) estimation: Umeyama alignment + RANSAC over 3D-3D pairs.

New capability beyond the reference (which simply loses any view it cannot
PnP against the growing cloud, src/Sfm.cpp:955-958): when an image set
contains a viewpoint break, the pipeline reconstructs each connected
component independently and aligns them with a similarity transform
estimated from cross-component 3D-3D correspondences (matched features
whose both endpoints already have track points). See pipeline/merge.py.

TPU formulation mirrors ops/ransac.py: fixed-budget vmapped hypotheses,
closed-form Umeyama (Umeyama 1991) per 3-point minimal sample, MSAC
selection, then a full-inlier Umeyama refit.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.ops.ransac import ransac


class Sim3(NamedTuple):
    s: jnp.ndarray  # () scale
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)


class Sim3Result(NamedTuple):
    sim: Sim3
    inliers: jnp.ndarray  # (M,) bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def apply_sim3(sim: Sim3, X: jnp.ndarray) -> jnp.ndarray:
    """Y = s * R @ X + t, batched over leading dims of X (…, 3)."""
    return sim.s * (X @ sim.R.T) + sim.t


def umeyama(
    X: jnp.ndarray, Y: jnp.ndarray, w: jnp.ndarray | None = None
) -> Sim3:
    """Weighted least-squares similarity Y ≈ s R X + t (Umeyama 1991).

    X, Y: (N, 3); w: (N,) nonnegative weights (None = uniform). Degenerate
    inputs (rank-deficient covariance) produce a best-effort rotation via
    SVD sign correction; callers gate on inlier support, not on this.
    """
    N = X.shape[0]
    if w is None:
        w = jnp.ones((N,), X.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    wn = w / wsum
    mx = jnp.sum(wn[:, None] * X, axis=0)
    my = jnp.sum(wn[:, None] * Y, axis=0)
    Xc = X - mx
    Yc = Y - my
    cov = (wn[:, None] * Yc).T @ Xc  # (3, 3) — maps X-frame to Y-frame
    U, D, Vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, sgn]))
    R = U @ S @ Vt
    var_x = jnp.sum(wn * jnp.sum(Xc * Xc, axis=-1))
    s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_x, 1e-12)
    t = my - s * (R @ mx)
    return Sim3(s=s, R=R, t=t)


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "min_inliers"))
def estimate_sim3_reproj_ransac(
    key: jax.Array,
    X: jnp.ndarray,  # (M, 3) source points (component B frame)
    Y: jnp.ndarray,  # (M, 3) target points (component A frame)
    cams: jnp.ndarray,  # (M, 6) per-pair A-frame camera (angle-axis+t)
    obs_xy: jnp.ndarray,  # (M, 2) pixel observation in that camera
    K: jnp.ndarray,  # (3, 3)
    valid: jnp.ndarray,  # (M,)
    threshold_px: float | jnp.ndarray,
    n_hypotheses: int = 4096,
    min_inliers: int = 8,
) -> Sim3Result:
    """Sim(3) RANSAC scored by 2D reprojection instead of 3D-3D distance.

    Hypotheses are still 3-point Umeyama fits on (X, Y) pairs, but support
    is counted by projecting s R X + t through each pair's A-frame camera
    and comparing with the observed pixel — the criterion that actually
    matters for the merge. 3D-3D distance scoring is weak exactly when the
    components disagree: B's point depths along the (few, outlier-heavy)
    cross-component tracks are the noisiest coordinate, so a wrong-scale
    alignment can collect a spurious 3D consensus (VERDICT r2: temple merge
    at 10.8x the true camera gap passed with 3D inliers). Reprojection
    into A's views exposes it immediately.
    """
    from sfm_danpipeline_tpu.ops.lie import exp_so3

    Rc = exp_so3(cams[:, :3])  # (M, 3, 3)
    tc = cams[:, 3:]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    def reproj_err(model):
        R = model[:9].reshape(3, 3)
        t = model[9:12]
        s = model[12]
        Xw = s * (X @ R.T) + t  # (M, 3) in A frame
        cam = jnp.einsum("mij,mj->mi", Rc, Xw) + tc
        z = jnp.where(jnp.abs(cam[:, 2]) < 1e-9, 1e-9, cam[:, 2])
        u = cam[:, 0] / z * fx + cx
        v = cam[:, 1] / z * fy + cy
        r = jnp.sqrt((u - obs_xy[:, 0]) ** 2 + (v - obs_xy[:, 1]) ** 2)
        r = jnp.where(cam[:, 2] > 0, r, 1e9)
        return jnp.where(jnp.isfinite(r), r, 1e9)

    def fit(idx):
        sim = umeyama(X[idx], Y[idx])
        return jnp.concatenate([sim.R.reshape(-1), sim.t, sim.s[None]])

    model, inliers, n_in = ransac(
        key, fit, reproj_err, valid, n_hypotheses, 3, threshold_px
    )

    def refit(inl):
        sim = umeyama(X, Y, inl.astype(X.dtype))
        m = jnp.concatenate([sim.R.reshape(-1), sim.t, sim.s[None]])
        return (reproj_err(m) < threshold_px) & valid, sim

    inliers, sim = refit(inliers)
    inliers, sim = refit(inliers)
    n_in = jnp.sum(inliers)
    ok = (
        (n_in >= min_inliers)
        & jnp.isfinite(sim.s)
        & (sim.s > 1e-6)
        & jnp.all(jnp.isfinite(sim.R))
        & jnp.all(jnp.isfinite(sim.t))
    )
    return Sim3Result(sim=sim, inliers=inliers, n_inliers=n_in, ok=ok)


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def estimate_sim3_ransac(
    key: jax.Array,
    X: jnp.ndarray,  # (M, 3) source points
    Y: jnp.ndarray,  # (M, 3) target points
    valid: jnp.ndarray,  # (M,)
    threshold: float | jnp.ndarray,  # inlier distance in target units
    n_hypotheses: int = 2048,
    min_inliers: int = 8,
) -> Sim3Result:
    """RANSAC similarity from noisy 3D-3D correspondences.

    3-point minimal Umeyama hypotheses, MSAC selection, then two
    refit-on-inliers polish rounds. `ok` requires `min_inliers` support and
    a positive, finite scale.
    """

    def fit(idx):
        sim = umeyama(X[idx], Y[idx])
        return jnp.concatenate(
            [sim.R.reshape(-1), sim.t, sim.s[None]]
        )

    def residuals(model):
        R = model[:9].reshape(3, 3)
        t = model[9:12]
        s = model[12]
        pred = s * (X @ R.T) + t
        r = jnp.linalg.norm(pred - Y, axis=-1)
        return jnp.where(jnp.isfinite(r), r, 1e9)

    model, inliers, n_in = ransac(
        key, fit, residuals, valid, n_hypotheses, 3, threshold
    )

    def refit(inl, _):
        sim = umeyama(X, Y, inl.astype(X.dtype))
        pred = apply_sim3(sim, X)
        r = jnp.linalg.norm(pred - Y, axis=-1)
        return (r < threshold) & valid, sim

    inliers, sim = refit(inliers, None)
    inliers, sim = refit(inliers, None)
    n_in = jnp.sum(inliers)
    ok = (
        (n_in >= min_inliers)
        & jnp.isfinite(sim.s)
        & (sim.s > 1e-6)
        & jnp.all(jnp.isfinite(sim.R))
        & jnp.all(jnp.isfinite(sim.t))
    )
    return Sim3Result(sim=sim, inliers=inliers, n_inliers=n_in, ok=ok)
