"""Camera projection, undistortion, and reprojection-error primitives.

Replaces cv::projectPoints (reference src/Sfm.cpp:840,847) and
cv::undistortPoints (src/Sfm.cpp:820-821). Cameras are world-to-camera
[R | t]: x_cam = R @ X + t, matching the reference's projection-matrix
convention (src/Sfm.cpp:768-772).
"""
from __future__ import annotations

import jax.numpy as jnp


def distort_normalized(
    xn: jnp.ndarray, dist: jnp.ndarray
) -> jnp.ndarray:
    """Forward 5-coefficient OpenCV distortion model on normalized coords
    (k1, k2, p1, p2, k3) — what cv::projectPoints applies before K
    (reference src/Sfm.cpp:840,847). xn: (..., 2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def project(
    X: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    K: jnp.ndarray,
    dist: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Project world points into pixels. X: (..., 3) -> (..., 2).

    `dist` applies the reference's 5-coefficient model (cv::projectPoints
    semantics, src/Sfm.cpp:840,847). The pipeline canonicalizes keypoints to
    ideal pinhole pixels up front (pipeline/sfm.py), so internal callers
    pass dist=None; pass it when reprojecting against RAW detections.
    """
    x_cam = X @ R.T + t
    x_n = x_cam[..., :2] / jnp.where(
        jnp.abs(x_cam[..., 2:3]) < 1e-12, 1e-12, x_cam[..., 2:3]
    )
    if dist is not None:
        x_n = distort_normalized(x_n, dist)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack(
        [x_n[..., 0] * fx + cx, x_n[..., 1] * fy + cy], axis=-1
    )


def project_normalized(
    X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Project into normalized camera coordinates (z-divide, no K)."""
    x_cam = X @ R.T + t
    return x_cam[..., :2] / jnp.where(
        jnp.abs(x_cam[..., 2:3]) < 1e-12, 1e-12, x_cam[..., 2:3]
    )


def depths(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame z of world points (cheirality test input)."""
    return X @ R.T[:, 2] + t[2]


def undistort_points(
    pts: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray, iters: int = 5
) -> jnp.ndarray:
    """Pixels -> normalized camera coords, inverting radial/tangential
    distortion by fixed-point iteration (cv::undistortPoints semantics,
    used at src/Sfm.cpp:820-821). pts: (..., 2).

    With zero distortion (the temple dataset) this reduces to K^-1.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (pts[..., 0] - cx) / fx
    y = (pts[..., 1] - cy) / fy
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x0, y0 = x, y
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return jnp.stack([x, y], axis=-1)


def undistort_image(
    img: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray
) -> jnp.ndarray:
    """Resample a distorted image onto the ideal pinhole grid (the image
    analogue of undistort_points; cv::undistort semantics).

    img: (H, W) or (H, W, C). For each ideal pixel, the forward distortion
    model locates its source in the raw image; bilinear sample. Keeps the
    same K. Used by the dense stage so plane-sweep photo-consistency agrees
    with the keypoint canonicalization (pipeline/sfm.py) when dist != 0.
    """
    from sfm_danpipeline_tpu.ops.interp import bilinear_sample

    H, W = img.shape[:2]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u, v = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32),
        jnp.arange(H, dtype=jnp.float32),
        indexing="xy",
    )
    xn = jnp.stack([(u - cx) / fx, (v - cy) / fy], axis=-1)
    xd = distort_normalized(xn, dist)
    us = xd[..., 0] * fx + cx
    vs = xd[..., 1] * fy + cy
    if img.ndim == 2:
        return bilinear_sample(img, us, vs)
    return jnp.stack(
        [bilinear_sample(img[..., c], us, vs) for c in range(img.shape[-1])],
        axis=-1,
    )


def reprojection_error(
    X: jnp.ndarray,
    obs: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    K: jnp.ndarray,
) -> jnp.ndarray:
    """Euclidean pixel reprojection error per point (reference filter at
    src/Sfm.cpp:850-860 keeps errors <= 6 px in both views)."""
    proj = project(X, R, t, K)
    return jnp.linalg.norm(proj - obs, axis=-1)
