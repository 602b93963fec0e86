"""Batched DLT triangulation with reprojection filtering.

Replaces cv::triangulatePoints + convertPointsFromHomogeneous + the <=6 px
reprojection gate (`StructFromMotion::triangulateViews`,
src/Sfm.cpp:804-878). The DLT 4x4 system is solved as the smallest
eigenvector of A^T A via jnp.linalg.eigh — batched over points with vmap,
so the whole view-pair triangulates in one fused XLA computation.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.ops.projection import project


def pose_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """[R | t] as a (3, 4) projection (normalized camera, no K)."""
    return jnp.concatenate([R, t[..., :, None]], axis=-1)


def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    """Two-view DLT. P1, P2: (3,4) normalized projections; x1, x2: (N, 2)
    normalized image points. Returns (N, 3) world points.

    A is the standard 4x4 DLT matrix. Instead of the homogeneous SVD/eigh
    null vector (cv::triangulatePoints), we solve the *inhomogeneous* form
    (fix W=1): min ||M X + b|| with M = A[:, :3], b = A[:, 3], i.e. the 3x3
    normal equations in closed form. Equivalent for finite points, and a
    pure VPU computation — a vmapped 4x4 eigh lowers to a pathologically
    slow TPU loop (measured 28 s for 1k points vs milliseconds here).
    """

    def rows(P, a):
        return jnp.stack([a[0] * P[2] - P[0], a[1] * P[2] - P[1]])

    def one(a1, a2):
        A = jnp.concatenate([rows(P1, a1), rows(P2, a2)])  # (4, 4)
        M = A[:, :3]
        b = A[:, 3]
        H = M.T @ M + 1e-12 * jnp.eye(3)
        g = M.T @ b
        return -_solve3(H, g)

    return jax.vmap(one)(x1, x2)


def _solve3(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 SPD solve via adjugate (vmap/VPU friendly)."""
    a, b, c = H[0, 0], H[0, 1], H[0, 2]
    d, e, f = H[1, 1], H[1, 2], H[2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    x = A * g[0] + B * g[1] + C * g[2]
    y = B * g[0] + D * g[1] + E * g[2]
    z = C * g[0] + E * g[1] + F * g[2]
    return jnp.stack([x, y, z]) / det


def triangulate_and_filter(
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    px1: jnp.ndarray,
    px2: jnp.ndarray,
    K: jnp.ndarray,
    valid: jnp.ndarray,
    max_error_px: float = 6.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Triangulate matched observations and keep well-reprojected points.

    x1n/x2n: (N,2) normalized coords (undistorted); px1/px2: (N,2) raw pixel
    observations used for the error check; valid: (N,) match mask.
    Acceptance mirrors src/Sfm.cpp:850-860 (reprojection error <= 6 px in
    BOTH views) plus a positive-depth (cheirality) requirement in both
    views, which the reference gets implicitly from its pose filtering.
    Returns (points (N,3), keep (N,)).
    """
    P1 = pose_matrix(R1, t1)
    P2 = pose_matrix(R2, t2)
    X = triangulate_dlt(P1, P2, x1n, x2n)
    e1 = jnp.linalg.norm(project(X, R1, t1, K) - px1, axis=-1)
    e2 = jnp.linalg.norm(project(X, R2, t2, K) - px2, axis=-1)
    z1 = X @ R1.T[:, 2] + t1[2]
    z2 = X @ R2.T[:, 2] + t2[2]
    keep = (
        valid
        & (e1 <= max_error_px)
        & (e2 <= max_error_px)
        & (z1 > 0)
        & (z2 > 0)
    )
    return X, keep
