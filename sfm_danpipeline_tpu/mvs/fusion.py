"""Multi-view depth-map fusion into a dense colored cloud.

The analogue of PMVS2's patch filtering + its minImageNum visibility
requirement (reference options at src/Sfm.cpp:1258-1264): a depth-map pixel
survives only if its 3D point reprojects into >= `min_consistent` other
views with relative depth agreement better than `depth_consistency`.
Everything is batched over full depth maps (gathers + elementwise — VPU
work); final deduplication is a voxel-grid unique on host.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfm_danpipeline_tpu.ops.interp import bilinear_sample


class FusedCloud(NamedTuple):
    points: jnp.ndarray  # (M, 3)
    colors: jnp.ndarray  # (M, 3)
    valid: jnp.ndarray  # (M,)


@functools.partial(jax.jit, static_argnames=("min_consistent",))
def fuse_view(
    ref_idx: jnp.ndarray,
    depths: jnp.ndarray,  # (V, H, W) all depth maps (0 = invalid)
    colors: jnp.ndarray,  # (V, H, W, 3)
    R: jnp.ndarray,  # (V, 3, 3) world->cam
    t: jnp.ndarray,  # (V, 3)
    K: jnp.ndarray,
    cam_valid: jnp.ndarray,  # (V,)
    min_consistent: int = 2,
    depth_consistency: float = 0.01,
) -> FusedCloud:
    """Backproject one view's depth map and keep cross-view-consistent
    pixels. Returns fixed-shape (H*W,) arrays with a validity mask."""
    V, H, W = depths.shape
    d_ref = depths[ref_idx]
    ys, xs = jnp.mgrid[0:H, 0:W]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    # Backproject to world.
    xn = (xs - cx) / fx
    yn = (ys - cy) / fy
    cam_pts = jnp.stack([xn * d_ref, yn * d_ref, d_ref], axis=-1)  # (H,W,3)
    Rr = R[ref_idx]
    tr = t[ref_idx]
    world = (cam_pts - tr) @ Rr  # R^T (x - t)

    def consistency(s):
        cam_s = world @ R[s].T + t[s]  # (H, W, 3)
        z = cam_s[..., 2]
        zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = cam_s[..., 0] / zsafe * fx + cx
        v = cam_s[..., 1] / zsafe * fy + cy
        inside = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 0)
        d_s = bilinear_sample(depths[s], u, v)
        rel = jnp.abs(d_s - z) / jnp.maximum(z, 1e-9)
        ok = inside & (d_s > 0) & (rel < depth_consistency)
        usable = cam_valid[s] & (s != ref_idx)
        return ok & usable

    counts = jnp.sum(
        jax.vmap(consistency)(jnp.arange(V)), axis=0
    )  # (H, W)
    keep = (d_ref > 0) & (counts >= min_consistent)
    rgb = colors[ref_idx]
    return FusedCloud(
        points=world.reshape(-1, 3),
        colors=rgb.reshape(-1, 3),
        valid=keep.reshape(-1),
    )


def voxel_downsample(
    points: np.ndarray, colors: np.ndarray, voxel: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side voxel-grid dedup (one representative point per voxel) —
    the cloud-assembly analogue of the reference's 0.01 merge radius
    (src/Sfm.cpp:1216) applied at dense scale. Uses the native hash-grid
    (native/cloudio.cpp) when built; numpy unique otherwise."""
    if len(points) == 0:
        return points, colors
    from sfm_danpipeline_tpu.io.native import voxel_downsample_fast

    idx = voxel_downsample_fast(points, voxel)
    return points[idx], colors[idx]
