"""Measure feature/matching/pose parity against OpenCV on the temple set.

VERDICT r3 missing #1 asked for "keypoint-yield parity with OpenCV SIFT"
citing an estimate of 1.5-3k kp/image. cv2 (5.0) is importable in this
image, so parity is MEASURABLE, not estimable. This tool runs OpenCV's own
SIFT with the reference's exact parameters (src/Sfm.cpp:315-320:
nOctaveLayers=3, contrastThreshold=0.04, edgeThreshold=10, sigma=1.6) next
to ours and reports:

  yield        per-image keypoint counts, ours vs OpenCV
  repeatability  fraction of OpenCV keypoints with one of ours within
                 1.5 px (and the reverse) — detector agreement
  matches      ratio-test match count on each adjacent pair, ours vs
               OpenCV BFMatcher L2 knn k=2 @ 0.8 (src/Sfm.cpp:599-607)
  pose         relative-pose agreement on pair (0,1): angle between our
               R and OpenCV findEssentialMat+recoverPose's R, and the
               translation-direction angle

Prints one JSON line. Run CPU-only:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_opencv.py
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from sfm_danpipeline_tpu.config import PipelineConfig
    from sfm_danpipeline_tpu.io.calibration import load_calibration
    from sfm_danpipeline_tpu.io.images import load_images
    from sfm_danpipeline_tpu.ops.sift import detect_and_compute_batch
    from sfm_danpipeline_tpu.ops.matching import match_pair
    from sfm_danpipeline_tpu.ops.epipolar import (
        estimate_relative_pose_basins,
    )
    from sfm_danpipeline_tpu.ops.projection import undistort_points

    images = load_images("/root/reference/data/temple")
    calib = load_calibration(
        "/root/reference/data/temple/camera_calibration_template.xml"
    )
    cfg = PipelineConfig()

    # --- OpenCV side (reference parameters, src/Sfm.cpp:315-320) ---
    sift = cv2.SIFT_create(
        nfeatures=0, nOctaveLayers=3, contrastThreshold=0.04,
        edgeThreshold=10, sigma=1.6,
    )
    cv_kp, cv_desc = [], []
    for i in range(images.n_images):
        g8 = (np.asarray(images.gray[i]) * 255.0).astype(np.uint8)
        kps, desc = sift.detectAndCompute(g8, None)
        cv_kp.append(np.array([k.pt for k in kps], np.float32))
        cv_desc.append(desc)
    cv_counts = [len(k) for k in cv_kp]

    # --- ours ---
    kp = detect_and_compute_batch(jnp.asarray(images.gray), cfg.features)
    our_counts = [int(v) for v in np.asarray(kp.valid.sum(axis=1))]

    # Repeatability on every image: nearest-neighbor distance in pixels.
    rep_cv, rep_ours = [], []
    for i in range(images.n_images):
        ours_xy = np.asarray(kp.xy[i])[np.asarray(kp.valid[i])]
        cv_xy = cv_kp[i]
        if len(ours_xy) == 0 or len(cv_xy) == 0:
            continue
        d = np.linalg.norm(
            ours_xy[:, None, :] - cv_xy[None, :, :], axis=-1
        )
        rep_cv.append(float(np.mean(d.min(axis=0) <= 1.5)))
        rep_ours.append(float(np.mean(d.min(axis=1) <= 1.5)))

    # Adjacent-pair ratio matches (reference gate >=120, src/Sfm.cpp:533).
    bf = cv2.BFMatcher(cv2.NORM_L2)
    cv_match_counts, our_match_counts = [], []
    for i in range(images.n_images - 1):
        knn = bf.knnMatch(cv_desc[i], cv_desc[i + 1], k=2)
        good = [m for m, n in knn if m.distance < 0.8 * n.distance]
        cv_match_counts.append(len(good))
        m = match_pair(
            kp.descriptors[i], kp.valid[i],
            kp.descriptors[i + 1], kp.valid[i + 1],
            ratio=0.8,
        )
        our_match_counts.append(int(m.count))

    # Two-view pose on (0,1): OpenCV essential + recoverPose vs ours.
    K = np.asarray(calib.K, np.float64)
    knn = bf.knnMatch(cv_desc[0], cv_desc[1], k=2)
    good = [m for m, n in knn if m.distance < 0.8 * n.distance]
    p0 = np.float64([cv_kp[0][m.queryIdx] for m in good])
    p1 = np.float64([cv_kp[1][m.trainIdx] for m in good])
    E, inl = cv2.findEssentialMat(
        p0, p1, K, method=cv2.RANSAC, prob=0.999, threshold=1.0
    )
    _, R_cv, t_cv, _ = cv2.recoverPose(E, p0, p1, K, mask=inl)

    m = match_pair(
        kp.descriptors[0], kp.valid[0], kp.descriptors[1], kp.valid[1],
        ratio=0.8,
    )
    Kj = jnp.asarray(calib.K, jnp.float32)
    dj = jnp.asarray(calib.dist, jnp.float32)
    x1 = undistort_points(kp.xy[0][m.idx_a], Kj, dj)
    x2 = undistort_points(kp.xy[1][m.idx_b], Kj, dj)
    basins = estimate_relative_pose_basins(
        jax.random.key(cfg.geometry.seed), x1, x2, m.valid, focal=calib.fx
    )

    def rot_angle_deg(Ra, Rb):
        c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
        return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))

    def t_angle_deg(ta, tb):
        ca = float(
            abs(np.dot(ta.ravel(), tb.ravel()))
            / (np.linalg.norm(ta) * np.linalg.norm(tb) + 1e-12)
        )
        return float(np.degrees(np.arccos(np.clip(ca, -1.0, 1.0))))

    # Compare against the CLOSEST of our two pose basins (the pipeline
    # disambiguates them by third-view validation; for a two-view parity
    # check the nearer basin is the comparable quantity).
    best = None
    for b in range(2):
        R_ours = np.asarray(basins.R[b], np.float64)
        t_ours = np.asarray(basins.t[b], np.float64)
        cand = (
            rot_angle_deg(R_cv, R_ours), t_angle_deg(t_cv, t_ours),
        )
        if best is None or cand[0] < best[0]:
            best = cand

    out = {
        "opencv_yield_mean": round(float(np.mean(cv_counts)), 1),
        "our_yield_mean": round(float(np.mean(our_counts)), 1),
        "opencv_yield": cv_counts,
        "our_yield": our_counts,
        "repeat_cv_found_by_ours_pct": round(
            100 * float(np.mean(rep_cv)), 1
        ),
        "repeat_ours_found_by_cv_pct": round(
            100 * float(np.mean(rep_ours)), 1
        ),
        "opencv_adjacent_matches": cv_match_counts,
        "our_adjacent_matches": our_match_counts,
        "pose01_rot_diff_deg": round(best[0], 3),
        "pose01_tdir_diff_deg": round(best[1], 3),
        "pose01_cv_inliers": int(inl.sum()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
