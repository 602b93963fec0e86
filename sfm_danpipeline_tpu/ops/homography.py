"""Homography estimation (4-point DLT) with vmapped RANSAC.

Replaces cv::findHomography RANSAC as used by the reference for
(a) pair scoring via inlier counting with threshold 0.004 * max image
dimension (`findHomographyInliers`, src/Sfm.cpp:667-689) and
(b) match pruning at reprojection threshold 2.5 px
(`prunedMatchingWithHomography`, src/Sfm.cpp:610-662).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.ops.ransac import ransac


def _hartley_normalize(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Similarity transform T with T x centered and ~sqrt(2) RMS radius.
    Conditioning for the f32 DLT (Hartley's normalized 8-point insight —
    pixel-coordinate monomials otherwise reach ~1e11 and the eigh of A^T A
    loses all precision in f32)."""
    mean = jnp.mean(x, axis=0)
    rms = jnp.sqrt(jnp.mean(jnp.sum((x - mean) ** 2, axis=-1))) + 1e-12
    s = jnp.sqrt(2.0) / rms
    T = jnp.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return (x - mean) * s, T


def _homography_from_four(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """DLT from 4 correspondences. x1, x2: (4, 2) pixels. Returns H (3,3)
    mapping x1 -> x2 (up to scale). Points are Hartley-normalized for f32
    conditioning; H is denormalized before return."""
    n1, T1 = _hartley_normalize(x1)
    n2, T2 = _hartley_normalize(x2)

    def rows(a, b):
        x, y = a[0], a[1]
        u, v = b[0], b[1]
        r1 = jnp.array([-x, -y, -1.0, 0.0, 0.0, 0.0, u * x, u * y, u])
        r2 = jnp.array([0.0, 0.0, 0.0, -x, -y, -1.0, v * x, v * y, v])
        return jnp.stack([r1, r2])

    A = jnp.concatenate([rows(n1[i], n2[i]) for i in range(4)])
    _, V = jnp.linalg.eigh(A.T @ A)
    Hn = V[:, 0].reshape(3, 3)
    H = jnp.linalg.inv(T2) @ Hn @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def transfer_error(H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Forward transfer error |H x1 - x2| in pixels. x: (M, 2)."""
    h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    p = h @ H.T
    w = jnp.where(jnp.abs(p[:, 2:3]) < 1e-12, 1e-12, p[:, 2:3])
    return jnp.linalg.norm(p[:, :2] / w - x2, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def homography_ransac(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float | jnp.ndarray,
    n_hypotheses: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RANSAC homography. Returns (H, inlier_mask, n_inliers).

    threshold: pixel transfer-error threshold. The reference scores pairs
    with threshold 0.004 * max(H, W) (src/Sfm.cpp:676) and prunes matches
    at 2.5 px (src/Sfm.cpp:640).
    """

    def fit(idx):
        return _homography_from_four(x1[idx], x2[idx])

    def residuals(H):
        return transfer_error(H, x1, x2)

    H, inliers, n_in = ransac(
        key, fit, residuals, valid, n_hypotheses, 4, threshold
    )
    H = _homography_refit(x1, x2, inliers.astype(x1.dtype))
    inliers = (transfer_error(H, x1, x2) < threshold) & valid
    return H, inliers, jnp.sum(inliers)


def _homography_refit(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Weighted DLT refit over an inlier set (w: (M,) 0/1 weights)."""
    wsum = jnp.sum(w) + 1e-12
    m1 = jnp.sum(x1 * w[:, None], axis=0) / wsum
    m2 = jnp.sum(x2 * w[:, None], axis=0) / wsum
    r1 = jnp.sqrt(jnp.sum(w * jnp.sum((x1 - m1) ** 2, -1)) / wsum) + 1e-12
    r2 = jnp.sqrt(jnp.sum(w * jnp.sum((x2 - m2) ** 2, -1)) / wsum) + 1e-12
    s1 = jnp.sqrt(2.0) / r1
    s2 = jnp.sqrt(2.0) / r2
    n1 = (x1 - m1) * s1
    n2 = (x2 - m2) * s2
    x, y = n1[:, 0], n1[:, 1]
    u, v = n2[:, 0], n2[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    r1rows = jnp.stack(
        [-x, -y, -ones, zeros, zeros, zeros, u * x, u * y, u], axis=-1
    )
    r2rows = jnp.stack(
        [zeros, zeros, zeros, -x, -y, -ones, v * x, v * y, v], axis=-1
    )
    A = jnp.concatenate([r1rows * w[:, None], r2rows * w[:, None]])
    _, V = jnp.linalg.eigh(A.T @ A)
    Hn = V[:, 0].reshape(3, 3)
    T1 = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    T1 = T1.at[0, 0].set(s1).at[1, 1].set(s1)
    T1 = T1.at[0, 2].set(-s1 * m1[0]).at[1, 2].set(-s1 * m1[1])
    T2 = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    T2 = T2.at[0, 0].set(s2).at[1, 1].set(s2)
    T2 = T2.at[0, 2].set(-s2 * m2[0]).at[1, 2].set(-s2 * m2[1])
    H = jnp.linalg.inv(T2) @ Hn @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])
