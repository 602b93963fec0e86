#!/usr/bin/env python
"""Dissect view-6 PnP starvation against the main component (views 0-5)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_cpu")

import logging
logging.basicConfig(level=logging.INFO, format="%(message)s")

import numpy as np
import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.calibration import load_calibration
from sfm_danpipeline_tpu.io.images import load_images
from sfm_danpipeline_tpu.ops.matching import match_all_pairs, PairMatches
from sfm_danpipeline_tpu.ops.sift import detect_and_compute_batch, Keypoints
from sfm_danpipeline_tpu.pipeline.incremental import (
    build_match_tables, _epipolar_filter_core)
from sfm_danpipeline_tpu.pipeline.tracks import find_2d3d
from sfm_danpipeline_tpu.ops.projection import undistort_points
from sfm_danpipeline_tpu.ops.pnp import solve_pnp_ransac

TEMPLE = "/root/reference/data/temple"
CACHE = "/tmp/temple_pipeA_cache.npz"

cfg = PipelineConfig().replace(max_points=8192)
images = load_images(TEMPLE)
calib = load_calibration(os.path.join(TEMPLE, "camera_calibration_template.xml"))
V = images.n_images
K = jnp.asarray(calib.K, jnp.float32)
dist = jnp.asarray(calib.dist, jnp.float32)

pi = np.asarray([i for i in range(V - 1) for j in range(i + 1, V)], np.int32)
pj = np.asarray([j for i in range(V - 1) for j in range(i + 1, V)], np.int32)

kp = detect_and_compute_batch(jnp.asarray(images.gray), cfg.features)
loose_r = max(cfg.matching.ratio, cfg.matching.registration_ratio)
matches = match_all_pairs(
    kp.descriptors, kp.valid, jnp.asarray(pi), jnp.asarray(pj),
    ratio=loose_r, max_matches=cfg.matching.max_matches,
    use_pallas=False, strict_ratio=cfg.matching.ratio)
strict = matches.at_ratio(cfg.matching.ratio)

# Build component A = views 0..5 with the real pipeline
from sfm_danpipeline_tpu.pipeline.sfm import SfMPipeline

pipe = SfMPipeline(cfg)
subA = type(images)(gray=images.gray[:6], color=images.color[:6],
                    sizes=images.sizes[:6], paths=images.paths[:6])
resA = pipe.run(subA, calib)
print("component A registered:", resA.registered_views,
      "points:", resA.metrics["n_points"])

# We need state in 10-view shape: rebuild tables at V=10 and transplant.
stateA = resA.state
# pad state arrays from 6 views to 10
import dataclasses
P = stateA.capacity
pad_v = V - stateA.n_views
state = dataclasses.replace(
    stateA,
    track_feat=jnp.pad(stateA.track_feat, ((0, 0), (0, pad_v)), constant_values=-1),
    feat_to_point=jnp.pad(stateA.feat_to_point, ((0, pad_v), (0, 0)), constant_values=-1),
    cameras=jnp.pad(stateA.cameras, ((0, pad_v), (0, 0))),
    camera_valid=jnp.pad(stateA.camera_valid, (0, pad_v)),
)
# NOTE: stateA used ITS OWN keypoints (detected on the 6-image batch) —
# identical images, so detections match the 10-image batch detections.

ft_a, ft_b, vt_loose = build_match_tables(matches, jnp.asarray(pi), jnp.asarray(pj), V)

new_view = 6
print(f"\n--- view {new_view} vs component A ---")
total_keep = 0
for d in range(6):
    fn = ft_a[new_view, d]
    fd = ft_b[new_view, d]
    mv = vt_loose[new_view, d]
    pn = kp.xy[new_view, fn]
    pd = kp.xy[d, fd]
    keep = _epipolar_filter_core(jax.random.key(100 + d), pn, pd, mv, K, dist, cfg)
    p, fnew, m = find_2d3d(state, jnp.asarray(new_view), jnp.asarray(d), fn, fd, keep)
    p0, f0, m0 = find_2d3d(state, jnp.asarray(new_view), jnp.asarray(d), fn, fd, mv)
    print(f"  done view {d}: loose={int(jnp.sum(mv))} epi_keep={int(jnp.sum(keep))} "
          f"support_filtered={int(jnp.sum(m))} support_nofilter={int(jnp.sum(m0))}")

# Full support set WITHOUT epipolar prefilter, then PnP at several thresholds
ps, fs, ms = [], [], []
for d in range(6):
    p, fnew, m = find_2d3d(state, jnp.asarray(new_view), jnp.asarray(d),
                           ft_a[new_view, d], ft_b[new_view, d], vt_loose[new_view, d])
    ps.append(p); fs.append(fnew); ms.append(m)
p = jnp.concatenate(ps); fnew = jnp.concatenate(fs); m = jnp.concatenate(ms)
# dedup by point id (keep first)
pn_ = np.asarray(p); mn = np.asarray(m)
seen = set(); keep_np = np.zeros(len(pn_), bool)
for i in range(len(pn_)):
    if mn[i] and pn_[i] not in seen:
        seen.add(pn_[i]); keep_np[i] = True
print(f"  total unique 2D-3D support (no filter): {keep_np.sum()}")
X = state.points_xyz[p]
px = kp.xy[new_view, fnew]
xn = undistort_points(px, K, dist)
for thr in (3.84, 6.0, 8.0, 12.0):
    res = solve_pnp_ransac(jax.random.key(5), X, px, xn, jnp.asarray(keep_np), K,
        threshold_px=thr, n_hypotheses=8192, min_inliers=8)
    print(f"  PnP thr={thr}: ok={bool(res.ok)} inliers={int(res.n_inliers)}")

# --- strict-subset sampling diagnostic (r4) ---
strict_tabs = build_match_tables(strict, jnp.asarray(pi), jnp.asarray(pj), V)
vt_strict = strict_tabs[2]
ps2, fs2, ms2, mss2 = [], [], [], []
for d in range(6):
    fn = ft_a[new_view, d]; fd = ft_b[new_view, d]
    p_, f_, m_ = find_2d3d(state, jnp.asarray(new_view), jnp.asarray(d), fn, fd, vt_loose[new_view, d])
    _, _, s_ = find_2d3d(state, jnp.asarray(new_view), jnp.asarray(d), fn, fd, vt_strict[new_view, d])
    ps2.append(p_); fs2.append(f_); ms2.append(m_); mss2.append(s_)
p2 = jnp.concatenate(ps2); f2 = jnp.concatenate(fs2); m2 = jnp.concatenate(ms2); s2 = jnp.concatenate(mss2)
print(f"  strict 2D-3D rows: {int(jnp.sum(s2))} of loose {int(jnp.sum(m2))}")
X2 = state.points_xyz[p2]; px2 = kp.xy[new_view, f2]; xn2 = undistort_points(px2, K, dist)
for nh in (4096, 8192):
    res = solve_pnp_ransac(jax.random.key(7), X2, px2, xn2, m2, K,
        threshold_px=3.84, n_hypotheses=nh, min_inliers=12, sample_mask=s2)
    # count loose-band inliers of the returned pose
    from sfm_danpipeline_tpu.ops.pnp import _reproj_errors_px
    Rt = jnp.concatenate([res.R, res.t[:, None]], -1)
    errs = _reproj_errors_px(Rt, X2, px2, K)
    print(f"  PnP nh={nh} strict-draws: ok={bool(res.ok)} n_in={int(res.n_inliers)} "
          f"loose8={int(jnp.sum((errs < 8.0) & m2))} tight={int(jnp.sum((errs < 3.84) & m2))}")

# --- exact pipeline call-path diagnostic (r4b): real match tables
# (position-aware ratio + dedup), real register_view ---
from sfm_danpipeline_tpu.pipeline.incremental import register_view
matches_p = match_all_pairs(
    kp.descriptors, kp.valid, jnp.asarray(pi), jnp.asarray(pj),
    ratio=loose_r, max_matches=cfg.matching.max_matches,
    use_pallas=False, strict_ratio=cfg.matching.ratio,
    xy=kp.xy, dup_radius=cfg.matching.dup_radius,
    dedup=cfg.matching.dedup_matches)
strict_p = matches_p.at_ratio(cfg.matching.ratio)
fa_p, fb_p, vl_p = build_match_tables(matches_p, jnp.asarray(pi), jnp.asarray(pj), V)
_, _, vs_p = build_match_tables(strict_p, jnp.asarray(pi), jnp.asarray(pj), V)
dv = np.full((V,), -1, np.int32); dv[:6] = range(6)
for trial in range(3):
    st2, ok, n_inl, n_sup = register_view(
        jax.random.key(1000 + trial), state, jnp.asarray(6, jnp.int32),
        jnp.asarray(dv), fa_p, fb_p, vl_p, kp.xy, K, dist, 640.0, cfg,
        valid_tab_strict=vs_p)
    print(f"  register_view trial {trial}: ok={bool(ok)} inliers={int(n_inl)} support={int(n_sup)}")

# --- isolate: register_view with the NON-dup-radius tables ---
_, _, vs_nd = build_match_tables(strict, jnp.asarray(pi), jnp.asarray(pj), V)
for trial in range(3):
    st2, ok, n_inl, n_sup = register_view(
        jax.random.key(2000 + trial), state, jnp.asarray(6, jnp.int32),
        jnp.asarray(dv), ft_a, ft_b, vt_loose, kp.xy, K, dist, 640.0, cfg,
        valid_tab_strict=vs_nd)
    print(f"  register_view nodup trial {trial}: ok={bool(ok)} inliers={int(n_inl)} support={int(n_sup)}")
# how many strict rows survive the dedup in each table flavor?
import sfm_danpipeline_tpu.pipeline.incremental as I
def strict_after_dedup(fa, fb, vl, vs):
    dv_c = jnp.clip(jnp.asarray(dv), 0)
    nv = jnp.asarray(6, jnp.int32)
    mfn = fa[nv, dv_c]; mfd = fb[nv, dv_c]
    mv = vl[nv, dv_c] & (jnp.asarray(dv) >= 0)[:, None]
    D = mfn.shape[0]
    def collect(d_idx, vtab):
        return find_2d3d(state, nv, jnp.clip(jnp.asarray(dv)[d_idx], 0), mfn[d_idx], mfd[d_idx], vtab[d_idx])
    p, f, m = jax.vmap(collect, in_axes=(0, None))(jnp.arange(D), mv)
    sv = vs[nv, dv_c] & (jnp.asarray(dv) >= 0)[:, None]
    _, _, ms = jax.vmap(collect, in_axes=(0, None))(jnp.arange(D), sv)
    p = p.reshape(-1); m = m.reshape(-1); ms = ms.reshape(-1)
    order = jnp.argsort((~m) * 2 + (m & ms), stable=True)
    p_s = p[order]; m_s = m[order]; s_s = ms[order]
    seen = jnp.full((state.capacity,), -1, jnp.int32)
    idx = jnp.arange(p_s.shape[0], dtype=jnp.int32)
    seen = seen.at[jnp.where(m_s, p_s, state.capacity - 1)].max(jnp.where(m_s, idx, -1))
    keep = m_s & (seen[p_s] == idx)
    return int(jnp.sum(keep)), int(jnp.sum(keep & s_s))
print("  nodup tables: keep,strict =", strict_after_dedup(ft_a, ft_b, vt_loose, vs_nd))
print("  dup tables:   keep,strict =", strict_after_dedup(fa_p, fb_p, vl_p, vs_p))
