"""BA residuals and per-observation Jacobian blocks.

The residual model is exactly the reference's SimpleReprojectionError
(src/BundleAdjustment.cpp:5-44): rotate by angle-axis, translate,
perspective-divide, scale by the ONE shared focal; the observation has the
principal point pre-subtracted. Jacobians come from jax.jacfwd on the
per-observation residual, vmapped over the observation table — autodiff is
the analogue of Ceres' AutoDiffCostFunction (src/BundleAdjustment.cpp:111).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.ops.lie import rotate_point


def _residual_one(
    cam: jnp.ndarray, focal: jnp.ndarray, X: jnp.ndarray, obs: jnp.ndarray
) -> jnp.ndarray:
    """(2,) residual of a single observation. cam: (6,) = [angle-axis, t]."""
    p = rotate_point(cam[:3], X) + cam[3:]
    z = jnp.where(jnp.abs(p[2]) < 1e-9, 1e-9, p[2])
    return focal * (p[:2] / z) - obs


def residuals(
    cameras: jnp.ndarray,
    focal: jnp.ndarray,
    points: jnp.ndarray,
    obs_cam: jnp.ndarray,
    obs_pt: jnp.ndarray,
    obs_xy: jnp.ndarray,
    obs_w: jnp.ndarray,
) -> jnp.ndarray:
    """(O, 2) weighted residuals for the whole observation table."""
    cams = cameras[obs_cam]
    pts = points[obs_pt]
    r = jax.vmap(_residual_one, in_axes=(0, None, 0, 0))(
        cams, focal, pts, obs_xy
    )
    return r * obs_w[:, None]


def cost(
    cameras: jnp.ndarray,
    focal: jnp.ndarray,
    points: jnp.ndarray,
    obs_cam: jnp.ndarray,
    obs_pt: jnp.ndarray,
    obs_xy: jnp.ndarray,
    obs_w: jnp.ndarray,
) -> jnp.ndarray:
    """Total squared reprojection cost (the LM objective)."""
    r = residuals(cameras, focal, points, obs_cam, obs_pt, obs_xy, obs_w)
    return 0.5 * jnp.sum(r * r)


def jacobian_blocks(
    cameras: jnp.ndarray,
    focal: jnp.ndarray,
    points: jnp.ndarray,
    obs_cam: jnp.ndarray,
    obs_pt: jnp.ndarray,
    obs_xy: jnp.ndarray,
    obs_w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-observation Jacobian blocks and residuals.

    Returns (r (O,2), Jc (O,2,6), Jf (O,2,1), Jp (O,2,3)), all pre-weighted
    by obs_w (so padded slots contribute nothing to any normal-equation sum).
    """

    def one(cam, X, obs, w):
        def f(c, fo, x):
            return _residual_one(c, fo, x, obs) * w

        r = f(cam, focal, X)
        Jc, Jf, Jp = jax.jacfwd(f, argnums=(0, 1, 2))(cam, focal, X)
        return r, Jc, Jf.reshape(2, 1), Jp

    return jax.vmap(one)(
        cameras[obs_cam], points[obs_pt], obs_xy, obs_w
    )
