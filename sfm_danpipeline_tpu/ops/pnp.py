"""PnP pose estimation: vmapped DLT-PnP RANSAC + Gauss-Newton refinement.

Replaces cv::solvePnPRansac(EPNP, 1000 iters, conf 0.99, thr 0.006*maxVal)
+ Rodrigues (`StructFromMotion::findCameraPosePNP`, src/Sfm.cpp:1137-1210),
including the reference's plausibility guards: reject poses with
||camera center|| > 200 (src/Sfm.cpp:1175) or incoherent rotation
(det R != 1, src/Sfm.cpp:791-799).

TPU formulation: minimal 6-point DLT hypotheses batched with vmap,
reprojection-error scoring over all correspondences at once, then a fixed
number of Gauss-Newton steps on (angle-axis, t) over the inlier set —
normal equations built with masked sums, solved 6x6. No dynamic shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.ops.lie import exp_so3, log_so3, rotate_point
from sfm_danpipeline_tpu.ops.ransac import ransac


class PnPResult(NamedTuple):
    R: jnp.ndarray  # (3,3)
    t: jnp.ndarray  # (3,)
    inliers: jnp.ndarray  # (M,) bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def _dlt_pnp(X: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Minimal DLT camera fit. X: (S, 3) world, x: (S, 2) normalized image.
    Returns (3, 4) [R|t] with R projected to SO(3)."""
    n = X.shape[0]
    ones = jnp.ones((n, 1))
    Xh = jnp.concatenate([X, ones], axis=-1)  # (S, 4)
    zeros = jnp.zeros((n, 4))
    # Rows: [X 0 -u X ; 0 X -v X] for P (3x4) row-major 12-vector.
    r1 = jnp.concatenate([Xh, zeros, -x[:, :1] * Xh], axis=-1)
    r2 = jnp.concatenate([zeros, Xh, -x[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2])  # (2S, 12)
    _, V = jnp.linalg.eigh(A.T @ A)
    P = V[:, 0].reshape(3, 4)
    M = P[:, :3]
    # Orthogonalize and rescale.
    U, S, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    R = (U * jnp.array([1.0, 1.0, 1.0]) * jnp.sign(det)) @ Vt
    scale = jnp.mean(S) * jnp.sign(det)
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    # Disambiguate overall sign via cheirality of the sample.
    z = X @ R.T[:, 2] + t[2]
    flip = jnp.sum(jnp.sign(z)) < 0
    # P and -P are the same projective camera; flipping both R's sign breaks
    # det=1, so flip (R, t) via a 180-degree-free sign fix: negate t and the
    # third row trick is invalid — instead rebuild from -P.
    U2, S2, Vt2 = jnp.linalg.svd(-M)
    det2 = jnp.linalg.det(U2 @ Vt2)
    R2 = (U2 * jnp.sign(det2)) @ Vt2
    scale2 = jnp.mean(S2) * jnp.sign(det2)
    t2 = -P[:, 3] / jnp.where(jnp.abs(scale2) < 1e-12, 1e-12, scale2)
    R = jnp.where(flip, R2, R)
    t = jnp.where(flip, t2, t)
    return jnp.concatenate([R, t[:, None]], axis=-1)


def _reproj_errors_px(
    Rt: jnp.ndarray, X: jnp.ndarray, px: jnp.ndarray, K: jnp.ndarray
) -> jnp.ndarray:
    R, t = Rt[:, :3], Rt[:, 3]
    cam = X @ R.T + t
    z = jnp.where(jnp.abs(cam[:, 2:3]) < 1e-9, 1e-9, cam[:, 2:3])
    uv = cam[:, :2] / z
    proj = uv * jnp.array([K[0, 0], K[1, 1]]) + jnp.array([K[0, 2], K[1, 2]])
    err = jnp.linalg.norm(proj - px, axis=-1)
    return jnp.where(cam[:, 2] > 0, err, jnp.inf)


def _gauss_newton_refine(
    R: jnp.ndarray,
    t: jnp.ndarray,
    X: jnp.ndarray,
    px: jnp.ndarray,
    K: jnp.ndarray,
    w: jnp.ndarray,
    iters: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked Gauss-Newton on (angle-axis, t) minimizing pixel reprojection."""
    params0 = jnp.concatenate([log_so3(R), t])

    def residual(params):
        wv, tv = params[:3], params[3:]
        cam = rotate_point(wv[None, :], X) + tv
        z = jnp.where(jnp.abs(cam[:, 2:3]) < 1e-9, 1e-9, cam[:, 2:3])
        uv = cam[:, :2] / z
        proj = uv * jnp.array([K[0, 0], K[1, 1]]) + jnp.array(
            [K[0, 2], K[1, 2]]
        )
        return ((proj - px) * w[:, None]).reshape(-1)

    jac = jax.jacfwd(residual)

    def step(params, _):
        r = residual(params)
        J = jac(params)
        H = J.T @ J + 1e-6 * jnp.eye(6)
        g = J.T @ r
        delta = jnp.linalg.solve(H, g)
        new = params - delta
        # Accept only if cost decreases (cheap LM-style safeguard).
        better = jnp.sum(residual(new) ** 2) < jnp.sum(r**2)
        return jnp.where(better, new, params), None

    params, _ = jax.lax.scan(step, params0, None, length=iters)
    return exp_so3(params[:3]), params[3:]


@functools.partial(
    jax.jit, static_argnames=("n_hypotheses", "sample_size", "min_inliers")
)
def solve_pnp_ransac(
    key: jax.Array,
    X: jnp.ndarray,
    px: jnp.ndarray,
    xn: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    threshold_px: float | jnp.ndarray,
    n_hypotheses: int = 1024,
    sample_size: int = 6,
    max_translation: float = 200.0,
    min_inliers: int = 6,
) -> PnPResult:
    """RANSAC PnP over 2D-3D correspondences.

    X: (M,3) world points; px: (M,2) pixel obs; xn: (M,2) normalized obs;
    valid: (M,) mask. threshold_px mirrors 0.006 * max image dimension
    (src/Sfm.cpp:1146,1154). A fallback recount at 8 px reproduces the
    reference's second-chance inlier pass (src/Sfm.cpp:1162-1170).
    """

    def fit(idx):
        return _dlt_pnp(X[idx], xn[idx])

    def residuals(Rt):
        # inf (behind-camera) residuals would poison the MSAC sum; clamp.
        return jnp.minimum(_reproj_errors_px(Rt, X, px, K), 1e9)

    Rt, inliers, n_in = ransac(
        key, fit, residuals, valid, n_hypotheses, sample_size, threshold_px
    )

    # Reference fallback: if support is thin, recount at 8 px (Sfm.cpp:1162-1170).
    loose = (_reproj_errors_px(Rt, X, px, K) < 8.0) & valid
    use_loose = n_in < jnp.maximum(10, jnp.sum(valid) // 5)
    inliers = jnp.where(use_loose, loose, inliers)

    w = inliers.astype(X.dtype)
    R, t = _gauss_newton_refine(Rt[:, :3], Rt[:, 3], X, px, K, w)
    err = _reproj_errors_px(jnp.concatenate([R, t[:, None]], -1), X, px, K)
    inliers = (err < threshold_px) & valid
    n_in = jnp.sum(inliers)

    center = -R.T @ t
    det_ok = jnp.abs(jnp.linalg.det(R) - 1.0) < 1e-3
    ok = (
        det_ok
        & (jnp.linalg.norm(center) <= max_translation)
        & (n_in >= max(sample_size, min_inliers))
    )
    return PnPResult(R=R, t=t, inliers=inliers, n_inliers=n_in, ok=ok)
