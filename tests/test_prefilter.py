"""Chunked epipolar prefilter equivalence.

epipolar_prefilter_table vmaps the per-pair RANSAC in fixed 64-pair
chunks under lax.map (a flat vmap scaled the compiled graph with the
O(V^2) pair count and crashed the TPU compiler at 1225 pairs — r5).
The chunked form must (a) equal the direct per-pair computation exactly,
including at pair counts that force padding, and (b) leave the padded
dummy rows harmless (they scatter to the never-read (0, 0) diagonal).
"""
import numpy as np
import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.pipeline.incremental import (
    _epipolar_filter_core,
    epipolar_prefilter_table,
)

V = 17  # C(17, 2) = 136 pairs: forces 3 chunks with 56 padded dummies
KMAX = 96
M = 64


def _scene(rng):
    """Random cameras on an arc viewing a point ball; matches = true
    correspondences plus injected outliers."""
    K = np.array([[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1.0]])
    pts = rng.uniform(-1, 1, (KMAX, 3))
    pts[:, 2] += 5.0
    kp_xy = np.zeros((V, KMAX, 2), np.float32)
    for v in range(V):
        ang = 0.05 * v
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        t = np.array([0.4 * v, 0.0, 0.0])
        cam = pts @ R.T + t
        uv = cam[:, :2] / cam[:, 2:3]
        kp_xy[v] = uv * 400.0 + [160.0, 120.0]
    pi, pj = [], []
    for i in range(V - 1):
        for j in range(i + 1, V):
            pi.append(i)
            pj.append(j)
    pi = np.asarray(pi, np.int32)
    pj = np.asarray(pj, np.int32)
    P = len(pi)
    idx = np.tile(np.arange(M, dtype=np.int32)[None], (P, 1))
    idx_b = idx.copy()
    # 25% outliers: permute the partner feature.
    out = rng.uniform(size=(P, M)) < 0.25
    idx_b[out] = rng.integers(0, KMAX, out.sum())
    valid = np.ones((P, M), bool)
    return K, kp_xy, pi, pj, idx, idx_b, valid


def test_chunked_prefilter_matches_direct():
    rng = np.random.default_rng(0)
    K, kp_xy, pi, pj, idx_a, idx_b, valid = _scene(rng)
    cfg = PipelineConfig()
    key = jax.random.key(7)
    dist = jnp.zeros(5, jnp.float32)
    table = epipolar_prefilter_table(
        key, jnp.asarray(idx_a), jnp.asarray(idx_b), jnp.asarray(valid),
        jnp.asarray(kp_xy), jnp.asarray(pi), jnp.asarray(pj),
        jnp.asarray(K, jnp.float32), dist, cfg, V,
    )
    # Direct reference: run the per-pair core with the same per-pair keys
    # (the chunked reshape preserves key order).
    keys = jax.random.split(key, ((len(pi) + 63) // 64) * 64)
    for p in [0, 1, 67, len(pi) - 1]:  # spot-check incl. chunk boundaries
        i, j = int(pi[p]), int(pj[p])
        ref = _epipolar_filter_core(
            keys[p], jnp.asarray(kp_xy[i, idx_a[p]]),
            jnp.asarray(kp_xy[j, idx_b[p]]), jnp.asarray(valid[p]),
            jnp.asarray(K, jnp.float32), dist, cfg,
        )
        np.testing.assert_array_equal(
            np.asarray(table[i, j]), np.asarray(ref),
            err_msg=f"pair {p} ({i},{j}) mismatch",
        )
        np.testing.assert_array_equal(
            np.asarray(table[j, i]), np.asarray(ref)
        )
    # The filter keeps most TRUE correspondences and prunes outliers on
    # at least the adjacent (well-conditioned) pairs.
    p0 = 0  # pair (0, 1)
    kept = np.asarray(table[0, 1])
    true_rows = idx_a[p0] == idx_b[p0]
    assert kept[true_rows].mean() > 0.9
    assert kept[~true_rows].mean() < 0.3
