"""Point-cloud filtering.

Replaces the reference's PCL filters (src/Sfm.cpp:1323-1345):
 - PassThrough on x in [0.003, 0.83] (cloudPointFilter, Sfm.cpp:1327-1331)
 - RadiusOutlierRemoval: keep points with >= 150 neighbors within 0.07
   (removePoints, Sfm.cpp:1337-1343)

TPU formulation: masks over fixed-shape arrays; neighbor counting is a
chunked pairwise-distance sweep (a (chunk x N) matmul-shaped computation
per step via lax.map — no kd-tree, the O(N^2) sweep IS the TPU-friendly
form at these sizes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_AXIS = {"x": 0, "y": 1, "z": 2}


def passthrough_mask(
    points: jnp.ndarray,
    axis: str = "x",
    lo: float = 0.003,
    hi: float = 0.83,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PassThrough filter mask (reference defaults: x in [0.003, 0.83])."""
    a = points[:, _AXIS[axis]]
    m = (a >= lo) & (a <= hi)
    if valid is not None:
        m = m & valid
    return m


@functools.partial(jax.jit, static_argnames=("chunk",))
def neighbor_counts(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    chunk: int = 1024,
) -> jnp.ndarray:
    """Number of valid neighbors within `radius` of each point (excluding
    itself). points: (N, 3); returns (N,) int32."""
    N = points.shape[0]
    pad = (-N) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    val = jnp.pad(valid, (0, pad))
    r2 = radius * radius

    pn2 = jnp.sum(points * points, axis=-1)  # (N,)

    def count_chunk(start):
        blk = jax.lax.dynamic_slice(pts, (start, 0), (chunk, 3))
        bval = jax.lax.dynamic_slice(val, (start,), (chunk,))
        d2 = (
            jnp.sum(blk * blk, -1)[:, None]
            + pn2[None, :]
            - 2.0 * blk @ points.T
        )
        near = (d2 <= r2) & valid[None, :] & bval[:, None]
        # exclude self-counting (distance ~0 to itself).
        return jnp.sum(near, axis=1) - bval.astype(jnp.int32)

    starts = jnp.arange(0, N + pad, chunk)
    counts = jax.lax.map(count_chunk, starts).reshape(-1)[: N]
    return counts


def radius_outlier_mask(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float = 0.07,
    min_neighbors: int = 150,
) -> jnp.ndarray:
    """RadiusOutlierRemoval mask (reference: r=0.07, >=150 neighbors)."""
    counts = neighbor_counts(points, valid, radius)
    return valid & (counts >= min_neighbors)
