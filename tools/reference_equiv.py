"""Reference-equivalent OpenCV pipeline: the measured baseline.

BASELINE.md's `vs_baseline` denominator was an order-of-magnitude estimate
(0.5 frames/s) because the reference binary can't build here (no
OpenCV-3.4/PCL/Ceres toolchain). But cv2 5.0 IS importable, so the
reference's *algorithmic flow* can be measured directly. This script is a
faithful re-creation of the reference's sparse pipeline in OpenCV calls —
measurement tooling, NOT part of the framework (the framework's own path
is the TPU-native one in sfm_danpipeline_tpu/):

  - SIFT nOctaveLayers=3, contrast 0.04, edge 10, sigma 1.6
    (src/Sfm.cpp:315-320)
  - BFMatcher L2 knn k=2, Lowe ratio 0.8 (src/Sfm.cpp:599-607)
  - best pair = highest essential pose-inlier ratio among pairs with
    >=120 matches (src/Sfm.cpp:408-585; we take argmax, the reference's
    ascending-map iteration is a documented bug)
  - findEssentialMat RANSAC p=0.999 thr=1.0 -> recoverPose
    (src/Sfm.cpp:743-755)
  - triangulatePoints + 6 px dual-view reprojection gate
    (src/Sfm.cpp:804-878)
  - incremental: +-1 frontier, 2D-3D from tracks, solvePnPRansac EPNP
    1000 iters thr 0.006*maxdim conf 0.99 (src/Sfm.cpp:1137-1210),
    triangulate vs done views, 0.01-radius merge (src/Sfm.cpp:1212-1244)
  - NO bundle adjustment: the reference's BA call sites are commented
    out (src/Sfm.cpp:492,886) — the honest baseline runs what the
    reference runs.

Prints one JSON line: wall-clock (steady, after one warm lap of the
feature stage), registered views, cloud size, and the camera centers so
our ATE can be compared against an INDEPENDENT full-pipeline
reconstruction.
"""
import json
import sys
import time

import numpy as np


def run(images_dir="/root/reference/data/temple", f=1520.0,
        cx=302.32, cy=246.87):
    import cv2
    import glob

    files = sorted(
        glob.glob(images_dir + "/*.png") + glob.glob(images_dir + "/*.jpg")
    )
    imgs = [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in files]
    V = len(imgs)
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
    maxdim = float(max(imgs[0].shape))

    sift = cv2.SIFT_create(0, 3, 0.04, 10, 1.6)
    bf = cv2.BFMatcher(cv2.NORM_L2)
    sift.detectAndCompute(imgs[0], None)  # warm OpenCV's lazy init

    t0 = time.time()
    feats = [sift.detectAndCompute(g, None) for g in imgs]
    kxy = [np.array([k.pt for k in kp], np.float64) for kp, _ in feats]
    t_features = time.time() - t0

    def ratio_match(i, j):
        knn = bf.knnMatch(feats[i][1], feats[j][1], k=2)
        return [(m.queryIdx, m.trainIdx) for m, n in knn
                if m.distance < 0.8 * n.distance]

    t0 = time.time()
    matches = {}
    for i in range(V):
        for j in range(i + 1, V):
            matches[(i, j)] = ratio_match(i, j)
    t_matching = time.time() - t0

    # Best pair: argmax pose-inlier ratio among pairs with >=120 matches.
    t0 = time.time()
    best, best_ratio = None, -1.0
    for (i, j), m in matches.items():
        if len(m) < 120:
            continue
        p0 = np.float64([kxy[i][a] for a, _ in m])
        p1 = np.float64([kxy[j][b] for _, b in m])
        E, inl = cv2.findEssentialMat(
            p0, p1, K, method=cv2.RANSAC, prob=0.999, threshold=1.0
        )
        if E is None or E.shape != (3, 3):
            continue
        r = float(inl.sum()) / len(m)
        if r > best_ratio:
            best, best_ratio = (i, j), r
    bi, bj = best
    m = matches[best]
    p0 = np.float64([kxy[bi][a] for a, _ in m])
    p1 = np.float64([kxy[bj][b] for _, b in m])
    E, inl = cv2.findEssentialMat(
        p0, p1, K, method=cv2.RANSAC, prob=0.999, threshold=1.0
    )
    _, R, t, inl2 = cv2.recoverPose(E, p0, p1, K, mask=inl)

    poses = {bi: (np.eye(3), np.zeros((3, 1))), bj: (R, t)}

    def projmat(v):
        Rv, tv = poses[v]
        return K @ np.hstack([Rv, tv])

    def triangulate(vi, vj, pairs):
        """DLT + 6px dual-view gate (src/Sfm.cpp:804-878). Returns
        [(xyz, {view: feat_idx})]."""
        if not pairs:
            return []
        a = np.float64([kxy[vi][p] for p, _ in pairs]).T
        b = np.float64([kxy[vj][q] for _, q in pairs]).T
        X4 = cv2.triangulatePoints(projmat(vi), projmat(vj), a, b)
        X = (X4[:3] / X4[3:]).T
        out = []
        for n, (pa, pb) in enumerate(pairs):
            x = X[n]
            ok = True
            for v, feat in ((vi, pa), (vj, pb)):
                Rv, tv = poses[v]
                pc = Rv @ x + tv.ravel()
                if pc[2] <= 0:
                    ok = False
                    break
                uv = K @ pc
                uv = uv[:2] / uv[2]
                if np.linalg.norm(uv - kxy[v][feat]) > 6.0:
                    ok = False
                    break
            if ok:
                out.append((x, {vi: pa, vj: pb}))
        return out

    cloud = triangulate(bi, bj, m)  # [(xyz, {view: feat})]
    done = {bi, bj}

    # Incremental loop (src/Sfm.cpp:893-1009).
    while len(done) < V:
        frontier = []
        for v in sorted(done):
            for c in (v - 1, v + 1):
                if 0 <= c < V and c not in done and c not in frontier:
                    frontier.append(c)
        if not frontier:
            break
        progress = False
        for nv in frontier:
            # 2D-3D support from tracks (src/Sfm.cpp:1011-1095).
            pts3, pts2 = [], []
            for dv in sorted(done):
                pm = matches.get((min(nv, dv), max(nv, dv)))
                if pm is None:
                    pm = ratio_match(min(nv, dv), max(nv, dv))
                feat_of_new = {}
                for a, b in pm:
                    fa, fb = (a, b) if nv < dv else (b, a)
                    feat_of_new[fb if nv < dv else fb] = None
                # map: feature in dv -> feature in nv
                dv_to_nv = {}
                for a, b in pm:
                    if nv < dv:
                        dv_to_nv[b] = a
                    else:
                        dv_to_nv[a] = b
                for xyz, track in cloud:
                    fd = track.get(dv)
                    if fd is not None and fd in dv_to_nv:
                        pts3.append(xyz)
                        pts2.append(kxy[nv][dv_to_nv[fd]])
            if len(pts3) < 7:
                continue
            ok, rvec, tvec, inliers = cv2.solvePnPRansac(
                np.float64(pts3), np.float64(pts2), K, None,
                iterationsCount=1000,
                reprojectionError=0.006 * maxdim,
                confidence=0.99,
                flags=cv2.SOLVEPNP_EPNP,
            )
            if not ok or inliers is None or len(inliers) < 6:
                continue
            if np.linalg.norm(tvec) > 200:
                continue
            Rn, _ = cv2.Rodrigues(rvec)
            poses[nv] = (Rn, tvec.reshape(3, 1))
            done.add(nv)
            progress = True
            # Triangulate vs every done view; merge at 0.01
            # (src/Sfm.cpp:964-991, 1212-1244).
            for dv in sorted(done - {nv}):
                i, j = min(nv, dv), max(nv, dv)
                new_pts = triangulate(i, j, matches[(i, j)])
                if not new_pts:
                    continue
                existing = np.array([c[0] for c in cloud])
                for xyz, track in new_pts:
                    if len(existing) and np.min(
                        np.linalg.norm(existing - xyz, axis=1)
                    ) < 0.01:
                        continue
                    cloud.append((xyz, track))
        if not progress:
            break
    t_recon = time.time() - t0
    total = t_features + t_matching + t_recon

    centers = {}
    for v, (Rv, tv) in poses.items():
        centers[v] = (-Rv.T @ tv).ravel().tolist()
    return {
        "t_features_s": round(t_features, 3),
        "t_matching_s": round(t_matching, 3),
        "t_reconstruction_s": round(t_recon, 3),
        "t_total_s": round(total, 3),
        "frames_per_s": round(V / total, 3),
        "n_registered": len(done),
        "n_points": len(cloud),
        "registered": sorted(done),
        "camera_centers": centers,
        "note": "reference flow, BA stubbed as in src/Sfm.cpp:492,886",
    }


if __name__ == "__main__":
    out = run(*sys.argv[1:2])
    print(json.dumps(out))
