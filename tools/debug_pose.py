#!/usr/bin/env python
"""Step through estimate_relative_pose internals for the (6,7) temple pair."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_cpu")

import numpy as np
import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.calibration import load_calibration
from sfm_danpipeline_tpu.ops.matching import PairMatches
from sfm_danpipeline_tpu.ops.sift import Keypoints
from sfm_danpipeline_tpu.ops.projection import undistort_points
from sfm_danpipeline_tpu.ops import epipolar as ep
from sfm_danpipeline_tpu.ops.ransac import sample_indices
from sfm_danpipeline_tpu.ops.triangulation import triangulate_dlt, pose_matrix

TEMPLE = "/root/reference/data/temple"
CACHE = "/tmp/temple_feat_cache.npz"
d = np.load(CACHE)
kp_xy = jnp.asarray(d["xy"])
calib = load_calibration(os.path.join(TEMPLE, "camera_calibration_template.xml"))
K = jnp.asarray(calib.K, jnp.float32)
dist = jnp.asarray(calib.dist, jnp.float32)
cfg = PipelineConfig()

# pair (6,7) is index: pairs in order; find it
V = 10
pairs = [(i, j) for i in range(V - 1) for j in range(i + 1, V)]
matches = PairMatches(*[jnp.asarray(d["m_" + k]) for k in
                        ("idx_a", "idx_b", "dist", "lowe", "valid")])
strict = matches.at_ratio(cfg.matching.ratio)


def analyze(a, b, key):
    p = pairs.index((a, b))
    m = jax.tree_util.tree_map(lambda x: x[p], strict)
    pa = kp_xy[a, m.idx_a]
    pb = kp_xy[b, m.idx_b]
    x1 = undistort_points(pa, K, dist)
    x2 = undistort_points(pb, K, dist)
    valid = m.valid
    focal = K[0, 0]
    thr = cfg.geometry.essential_threshold_px
    refit_n2 = (2.5 * thr / focal) ** 2

    idx = sample_indices(key, valid, 512, 8)
    models = jax.vmap(lambda i: ep._essential_from_eight(x1[i], x2[i]))(idx)
    res = jax.vmap(lambda E: ep.sampson_distance(E, x1, x2))(models)
    res = jnp.where(valid[None, :], res, 0.0)
    scores = jnp.sum(jnp.minimum(res, refit_n2), axis=-1)
    T = 8
    _, top = jax.lax.top_k(-scores, T)
    print(f"\n=== pair ({a},{b}), {int(jnp.sum(valid))} matches ===")
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    P1 = pose_matrix(eye, zero)
    for h in range(T):
        E_h = models[top[h]]
        band = (res[top[h]] < refit_n2) & valid
        Rs, ts = ep.decompose_essential(E_h)
        near, front = ep._cheirality_counts(Rs, ts, x1, x2, band)
        bsel = int(jnp.argmax(front * (x1.shape[0] + 1) + near))
        R, t = Rs[bsel], ts[bsel]
        rot = np.degrees(np.arccos(np.clip((np.trace(np.asarray(R)) - 1) / 2, -1, 1)))
        # median depth & angle of triangulated band points
        P2 = pose_matrix(R, t)
        X = triangulate_dlt(P1, P2, x1, x2)
        z = np.asarray(X[:, 2])[np.asarray(band)]
        C2 = np.asarray(-R.T @ t)
        Xn = np.asarray(X)[np.asarray(band)]
        r1 = Xn / np.linalg.norm(Xn, axis=1, keepdims=True)
        r2 = Xn - C2
        r2 = r2 / np.linalg.norm(r2, axis=1, keepdims=True)
        ang = np.degrees(np.arccos(np.clip(np.sum(r1 * r2, -1), -1, 1)))
        print(f"  cand {h}: msac={float(scores[top[h]]):.2e} band={int(jnp.sum(band))} "
              f"front={int(front[bsel])} near={int(near[bsel])} rot={rot:.2f}deg "
              f"med_depth={np.median(z):.1f} med_ang={np.median(ang):.2f}deg")
    pose = ep.estimate_relative_pose(key, x1, x2, valid, focal=focal,
                                     threshold_px=thr, n_hypotheses=512)
    Rf = np.asarray(pose.R)
    rot = np.degrees(np.arccos(np.clip((np.trace(Rf) - 1) / 2, -1, 1)))
    print(f"  FINAL: ok={bool(pose.ok)} n_in={int(pose.n_inliers)} rot={rot:.2f}deg")


for key in [jax.random.key(7), jax.random.key(3), jax.random.key(11)]:
    analyze(6, 7, key)
analyze(0, 1, jax.random.key(7))
analyze(8, 9, jax.random.key(7))
