"""SO(3) utilities: angle-axis (Rodrigues) exp/log maps.

Replaces cv::Rodrigues (reference src/Sfm.cpp:1190) and Ceres'
AngleAxisRotatePoint (src/BundleAdjustment.cpp:14); the BA camera
parameterization is 6-dof angle-axis + translation
(src/BundleAdjustment.cpp:56-76). All functions are pure jnp, safe under
jit/vmap/grad, with Taylor fallbacks near the identity so autodiff through
the BA residual is stable at theta -> 0.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector. w: (..., 3) -> (..., 3, 3)."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: angle-axis (..., 3) -> rotation matrix (..., 3, 3).

    Uses sin(t)/t and (1-cos t)/t^2 with Taylor expansions near zero so the
    function (and its autodiff) is well-defined at w=0.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    # Double-where: clamp the unsafe branch's input so its (unused) gradient
    # is finite — grad flows through BOTH branches of a where.
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(theta)/theta and (1 - cos(theta))/theta^2.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> angle-axis (..., 3).

    Valid for theta in [0, pi); at theta ~ pi the axis from the
    antisymmetric part degenerates, which never occurs for the incremental
    relative poses this pipeline optimizes (adjacent-view baselines).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Antisymmetric part gives axis * sin(theta).
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < 1e-6
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,  # Taylor of theta / (2 sin theta)
        theta / (2.0 * jnp.where(small, 1.0, sin_theta)),
    )
    return v * scale[..., None]


def rotate_point(w: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate point(s) p (..., 3) by angle-axis w (..., 3) without forming R.

    The direct Rodrigues rotation used by the BA residual (the jnp analogue
    of ceres::AngleAxisRotatePoint at src/BundleAdjustment.cpp:14).
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    cos_t = jnp.where(small, 1.0 - theta2 / 2.0, jnp.cos(theta))
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cross = jnp.cross(w, p)
    dot = jnp.sum(w * p, axis=-1, keepdims=True)
    one_m_cos_over_t2 = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - cos_t) / theta2_safe
    )
    return p * cos_t + cross * sinc + w * dot * one_m_cos_over_t2
