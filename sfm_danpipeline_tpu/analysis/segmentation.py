"""Color-based region-growing segmentation.

Replaces `Segmentation::color_based_growing_segmentation`
(src/Segmentation.cpp:3-66): PassThrough z in [0, 14], PCL RegionGrowingRGB
(distance 10, point-color 6, region-color 5, min cluster 600), abort when
zero clusters.

TPU formulation: region growing == connected components of the graph whose
edges join points within `distance` AND within `point_color` RGB distance.
We build a kNN adjacency (chunked pairwise sweep) and run iterative
min-label propagation (lax.while_loop) to a fixed point — a deterministic,
fixed-shape equivalent of PCL's queue-based growth. PCL's second-stage
region merging by average color (`region_color`) is applied afterwards on
the cluster graph. Colors are in PCL's 0-255 scale for threshold parity.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SegmentationResult(NamedTuple):
    labels: jnp.ndarray  # (N,) int32 cluster label per point (-1 = dropped)
    n_clusters: jnp.ndarray  # () int32 — clusters >= min_cluster_size


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_indices(
    points: jnp.ndarray, valid: jnp.ndarray, k: int = 16, chunk: int = 512
) -> jnp.ndarray:
    """Indices of the k nearest valid neighbors per point (self excluded)."""
    N = points.shape[0]
    pad = (-N) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pn2 = jnp.sum(points * points, axis=-1)
    big = 3.4e38

    def one_chunk(start):
        blk = jax.lax.dynamic_slice(pts, (start, 0), (chunk, 3))
        d2 = (
            jnp.sum(blk * blk, -1)[:, None]
            + pn2[None, :]
            - 2.0 * blk @ points.T
        )
        rows = start + jnp.arange(chunk)
        cols = jnp.arange(N)
        d2 = jnp.where(valid[None, :], d2, big)
        d2 = jnp.where(rows[:, None] == cols[None, :], big, d2)  # no self
        _, idx = jax.lax.top_k(-d2, k)
        return idx

    starts = jnp.arange(0, N + pad, chunk)
    out = jax.lax.map(one_chunk, starts).reshape(-1, k)[:N]
    return out.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "max_iters")
)
def region_growing_rgb(
    points: jnp.ndarray,
    colors255: jnp.ndarray,
    valid: jnp.ndarray,
    distance: float = 10.0,
    point_color: float = 6.0,
    region_color: float = 5.0,
    min_cluster: int = 600,
    k: int = 16,
    max_iters: int = 200,
) -> SegmentationResult:
    """RegionGrowingRGB with the reference's thresholds
    (src/Segmentation.cpp:29-35). colors255: (N, 3) in [0, 255]."""
    N = points.shape[0]
    nbr = knn_indices(points, valid, k=k)  # (N, k)

    d = points[nbr] - points[:, None, :]
    dist_ok = jnp.sum(d * d, -1) <= distance * distance
    dc = colors255[nbr] - colors255[:, None, :]
    color_ok = jnp.sum(jnp.abs(dc), -1) / 3.0 <= point_color
    edge = dist_ok & color_ok & valid[:, None] & valid[nbr]

    # Min-label propagation over the symmetric closure: labels flow along
    # edges in both directions via a scatter-min.
    init = jnp.where(valid, jnp.arange(N, dtype=jnp.int32), jnp.int32(N))

    def body(state):
        labels, _ = state
        nbr_lab = jnp.where(edge, labels[nbr], N)
        pulled = jnp.minimum(labels, jnp.min(nbr_lab, axis=1))
        # push: my label to my neighbors (scatter-min).
        tgt = jnp.where(edge, nbr, N)
        pushed = jnp.full((N + 1,), N, jnp.int32)
        pushed = pushed.at[tgt.reshape(-1)].min(
            jnp.broadcast_to(labels[:, None], tgt.shape).reshape(-1)
        )
        new = jnp.minimum(pulled, pushed[:N])
        changed = jnp.any(new != labels)
        return new, changed

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(
        cond, body, (init, jnp.asarray(True))
    )

    # Region merging by average color (PCL stage 2): clusters whose mean
    # colors differ < region_color and that touch (share a kNN edge) merge.
    seg_sum = jnp.zeros((N + 1, 3)).at[labels].add(
        jnp.where(valid[:, None], colors255, 0.0)
    )
    seg_cnt = jnp.zeros((N + 1,)).at[labels].add(valid.astype(jnp.float32))
    seg_mean = seg_sum / jnp.maximum(seg_cnt[:, None], 1.0)
    la = labels[:, None]
    lb = labels[nbr]
    touching = edge | (dist_ok & valid[:, None] & valid[nbr])
    mean_diff = jnp.sum(jnp.abs(seg_mean[la] - seg_mean[lb]), -1) / 3.0
    merge_edge = touching & (mean_diff <= region_color)

    def body2(state):
        lab, _ = state
        nbr_lab = jnp.where(merge_edge, lab[nbr], N)
        pulled = jnp.minimum(lab, jnp.min(nbr_lab, axis=1))
        tgt = jnp.where(merge_edge, nbr, N)
        pushed = jnp.full((N + 1,), N, jnp.int32)
        pushed = pushed.at[tgt.reshape(-1)].min(
            jnp.broadcast_to(lab[:, None], tgt.shape).reshape(-1)
        )
        new = jnp.minimum(pulled, pushed[:N])
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], body2, (labels, jnp.asarray(True))
    )

    # Cluster size filter (min 600, src/Segmentation.cpp:35).
    sizes = jnp.zeros((N + 1,), jnp.int32).at[labels].add(
        valid.astype(jnp.int32)
    )
    keep = valid & (sizes[labels] >= min_cluster)
    labels = jnp.where(keep, labels, -1)
    # Count surviving clusters (distinct root labels).
    is_root = keep & (labels == jnp.arange(N))
    n_clusters = jnp.sum(is_root.astype(jnp.int32))
    return SegmentationResult(labels=labels, n_clusters=n_clusters)


def segment_cloud(
    points: jnp.ndarray,
    colors01: jnp.ndarray,
    valid: jnp.ndarray,
    z_min: float = 0.0,
    z_max: float = 14.0,
    **kwargs,
) -> SegmentationResult:
    """Full reference flow: PassThrough z in [0,14] (Segmentation.cpp:24-28)
    then RegionGrowingRGB. colors01 in [0,1] are rescaled to PCL's 0-255."""
    zmask = (points[:, 2] >= z_min) & (points[:, 2] <= z_max) & valid
    return region_growing_rgb(points, colors01 * 255.0, zmask, **kwargs)
