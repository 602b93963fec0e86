"""Bundle-adjustment problem representation.

The reference builds one Ceres residual block per (point, observing camera)
pair by walking `Point3D.idxImage` (src/BundleAdjustment.cpp:83-109). Here
the same information is a dense observation table (SURVEY.md §7 core
representation): flat arrays indexed by observation, gathered/scattered with
segment sums — the form every kernel (residuals, Jacobian blocks, Schur
assembly) consumes directly.

Camera model (identical to SimpleReprojectionError,
src/BundleAdjustment.cpp:5-44): 6-dof angle-axis + translation per camera,
ONE shared focal length, observations with the principal point already
subtracted, residual = f * perspective_divide(R X + t) - obs.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BAProblem:
    """Fixed-shape BA problem.

    cameras: (C, 6)  angle-axis (3) + translation (3)
    focal:   ()      shared focal length
    points:  (P, 3)  world points
    obs_cam: (O,)    int32 camera index per observation
    obs_pt:  (O,)    int32 point index per observation
    obs_xy:  (O, 2)  pixel observation MINUS principal point
    obs_w:   (O,)    observation weight (0 = padding slot)
    fix_cam: (C,)    bool — cameras whose parameters are frozen
    fix_focal: ()    bool — freeze the shared focal
    fix_pt:  (P,) or None — points frozen (local-window BA keeps the rest
             of the map rigid while adjusting the active neighborhood)
    """

    cameras: jnp.ndarray
    focal: jnp.ndarray
    points: jnp.ndarray
    obs_cam: jnp.ndarray
    obs_pt: jnp.ndarray
    obs_xy: jnp.ndarray
    obs_w: jnp.ndarray
    fix_cam: jnp.ndarray
    fix_focal: jnp.ndarray
    fix_pt: jnp.ndarray | None = None

    @property
    def n_cameras(self) -> int:
        return self.cameras.shape[0]

    @property
    def n_points(self) -> int:
        return self.points.shape[0]

    @property
    def n_obs(self) -> int:
        return self.obs_cam.shape[0]


jax.tree_util.register_dataclass(
    BAProblem,
    data_fields=[
        "cameras",
        "focal",
        "points",
        "obs_cam",
        "obs_pt",
        "obs_xy",
        "obs_w",
        "fix_cam",
        "fix_focal",
        "fix_pt",
    ],
    meta_fields=[],
)


def make_problem(
    cameras: jnp.ndarray,
    focal,
    points: jnp.ndarray,
    obs_cam: jnp.ndarray,
    obs_pt: jnp.ndarray,
    obs_xy: jnp.ndarray,
    obs_w: jnp.ndarray,
    fix_cam: jnp.ndarray | None = None,
    fix_focal: bool = False,
) -> BAProblem:
    C = cameras.shape[0]
    if fix_cam is None:
        fix_cam = jnp.zeros((C,), bool)
    return BAProblem(
        cameras=jnp.asarray(cameras, jnp.float32),
        focal=jnp.asarray(focal, jnp.float32),
        points=jnp.asarray(points, jnp.float32),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_xy=jnp.asarray(obs_xy, jnp.float32),
        obs_w=jnp.asarray(obs_w, jnp.float32),
        fix_cam=jnp.asarray(fix_cam, bool),
        fix_focal=jnp.asarray(fix_focal, bool),
    )
