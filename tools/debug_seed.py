#!/usr/bin/env python
"""Dissect the secondary-component failure: bootstrap (6,7), inspect its
cloud, then try to register view 8 against it. Caches features/matches in
/tmp for fast iteration. Not part of the package."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_cpu")

import numpy as np
import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.calibration import load_calibration
from sfm_danpipeline_tpu.io.images import load_images
from sfm_danpipeline_tpu.ops.matching import match_all_pairs, PairMatches
from sfm_danpipeline_tpu.ops.sift import detect_and_compute_batch, Keypoints

TEMPLE = "/root/reference/data/temple"
CACHE = "/tmp/temple_feat_cache.npz"

cfg = PipelineConfig().replace(max_points=8192)
images = load_images(TEMPLE)
calib = load_calibration(os.path.join(TEMPLE, "camera_calibration_template.xml"))
V = images.n_images
K = jnp.asarray(calib.K, jnp.float32)
dist = jnp.asarray(calib.dist, jnp.float32)


def pair_list(n):
    pi, pj = [], []
    for i in range(n - 1):
        for j in range(i + 1, n):
            pi.append(i)
            pj.append(j)
    return np.asarray(pi, np.int32), np.asarray(pj, np.int32)


pi, pj = pair_list(V)

if os.path.exists(CACHE):
    d = np.load(CACHE)
    kp = Keypoints(*[jnp.asarray(d[k]) for k in
                     ("xy", "sigma", "angle", "response", "descriptors", "valid")])
    matches = PairMatches(*[jnp.asarray(d["m_" + k]) for k in
                            ("idx_a", "idx_b", "dist", "lowe", "valid")])
    print("loaded cache")
else:
    kp = detect_and_compute_batch(jnp.asarray(images.gray), cfg.features)
    loose = max(cfg.matching.ratio, cfg.matching.registration_ratio)
    matches = match_all_pairs(
        kp.descriptors, kp.valid, jnp.asarray(pi), jnp.asarray(pj),
        ratio=loose, max_matches=cfg.matching.max_matches,
        use_pallas=False, strict_ratio=cfg.matching.ratio)
    np.savez(CACHE,
             **{k: np.asarray(getattr(kp, k)) for k in
                ("xy", "sigma", "angle", "response", "descriptors", "valid")},
             **{"m_" + k: np.asarray(getattr(matches, k)) for k in
                ("idx_a", "idx_b", "dist", "lowe", "valid")})
    print("cached features+matches")

strict = matches.at_ratio(cfg.matching.ratio)

# --- 1. match-count + score matrix
from sfm_danpipeline_tpu.pipeline.bootstrap import score_pairs, bootstrap_pair

key = jax.random.key(0)
scores = score_pairs(key, strict, kp.xy, jnp.asarray(pi), jnp.asarray(pj), K, dist, jnp.asarray(640.0, jnp.float32), cfg)
print("\npair (i,j): strict_n  loose_n  score  usable")
sn = np.asarray(jnp.sum(strict.valid, -1))
ln = np.asarray(jnp.sum(matches.valid, -1))
sc = np.asarray(scores.pose_inlier_ratio)
us = np.asarray(scores.usable)
for p in range(len(pi)):
    print(f"  ({pi[p]},{pj[p]}): {sn[p]:4d} {ln[p]:5d}  {sc[p]:6.3f}  {us[p]}")

# --- 2. bootstrap (6,7)
from sfm_danpipeline_tpu.pipeline.tracks import init_state
from sfm_danpipeline_tpu.ops.lie import exp_so3

colors = jnp.zeros((V, kp.xy.shape[1], 3))
pair_of = {(int(a), int(b)): n for n, (a, b) in enumerate(zip(pi, pj))}


def inspect_bootstrap(bi, bj):
    st = init_state(V, cfg.features.max_keypoints, cfg.max_points, calib.fx)
    bm = jax.tree_util.tree_map(lambda a: a[pair_of[(bi, bj)]], strict)
    st, ok, _ = bootstrap_pair(jax.random.key(7), st, bm, kp.xy, colors,
                            bi, bj, K, dist, cfg)
    n = int(st.n_points)
    X = np.asarray(st.points_xyz[:n])
    depth = X[:, 2]
    cam_j = np.asarray(st.cameras[bj])
    Rj = np.asarray(exp_so3(jnp.asarray(cam_j[:3])))
    rot_deg = np.degrees(np.arccos(np.clip((np.trace(Rj) - 1) / 2, -1, 1)))
    print(f"\nbootstrap ({bi},{bj}): ok={bool(ok)} n_points={n}")
    print(f"  rel rotation: {rot_deg:.2f} deg, |t|={np.linalg.norm(cam_j[3:]):.3f}")
    print(f"  depth: min={depth.min():.2f} med={np.median(depth):.2f} "
          f"max={depth.max():.2f} p95={np.percentile(depth,95):.2f}")
    # planarity: PCA of the cloud
    Xc = X - X.mean(0)
    ev = np.linalg.eigvalsh(Xc.T @ Xc / n)
    print(f"  cloud PCA eigvals: {ev} (flatness ratio {ev[0]/ev[2]:.4f})")
    return st


st67 = inspect_bootstrap(6, 7)
st89 = inspect_bootstrap(8, 9)
st01 = inspect_bootstrap(0, 1)

# --- 3. register view 8 against {6,7}
from sfm_danpipeline_tpu.pipeline.incremental import (
    build_match_tables, register_view)

ft_a, ft_b, vt_loose = build_match_tables(matches, jnp.asarray(pi), jnp.asarray(pj), V)
dv = np.full((V,), -1, np.int32)
dv[0] = 6
dv[1] = 7
st, ok, n_inl, n_sup = register_view(
    jax.random.key(3), st67, jnp.asarray(8, jnp.int32), jnp.asarray(dv),
    ft_a, ft_b, vt_loose, kp.xy, K, dist, float(max(images.shape)), cfg)
print(f"\nregister view 8 vs (6,7): ok={bool(ok)} inliers={int(n_inl)} support={int(n_sup)}")

# how good are the 2D-3D correspondences? check reprojection of support set
# under ground truth unavailable; instead check: triangulated point quality —
# reproject cloud into view 6/7
from sfm_danpipeline_tpu.pipeline.tracks import prune_observations
n = int(st67.n_points)
X = np.asarray(st67.points_xyz[:n])
tf = np.asarray(st67.track_feat[:n])  # (n, V)
for v in (6, 7):
    cam = np.asarray(st67.cameras[v])
    R = np.asarray(exp_so3(jnp.asarray(cam[:3])))
    t = cam[3:]
    pc = X @ R.T + t
    uv = pc[:, :2] / pc[:, 2:3]
    proj = uv * [float(K[0, 0]), float(K[1, 1])] + [float(K[0, 2]), float(K[1, 2])]
    obs = np.asarray(kp.xy[v])[np.clip(tf[:, v], 0, None)]
    err = np.linalg.norm(proj - obs, axis=-1)
    m = tf[:, v] >= 0
    print(f"  view {v}: reproj err med={np.median(err[m]):.3f} p95={np.percentile(err[m],95):.3f} n={m.sum()}")
