"""Command-line driver.

The working version of the reference's commented-out CLI (main.cpp:20-44;
its live code hard-codes both input paths, main.cpp:50,59). Runs the same
3-stage flow as main.cpp:18-87 — SfM map, segmentation, dendrometry — plus
the dense stage, with artifact files replacing the blocking viewers
(SURVEY.md §7 non-goals): sparse.ply, MAP3D.pcd, cameras.json,
metrics.jsonl, segmentation labels, dendrometry report.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="itree3dmap-tpu",
        description="TPU-native incremental Structure-from-Motion",
    )
    p.add_argument("--images", required=True, help="image directory")
    p.add_argument(
        "--calibration", required=True, help="OpenCV XML calibration file"
    )
    p.add_argument("--output", default="out", help="output directory")
    p.add_argument(
        "--stages",
        default="sfm,dense,filter,segment,dendrometry",
        help="comma-separated stages: sfm,dense,filter,mesh,segment,"
        "dendrometry",
    )
    p.add_argument("--max-points", type=int, default=16384)
    p.add_argument("--max-keypoints", type=int, default=2048)
    p.add_argument(
        "--detector", choices=["sift", "akaze", "orb"], default="sift",
        help="feature detector (reference's selector, include/Sfm.h:40-61)",
    )
    p.add_argument(
        "--matcher", choices=["bf", "flow"], default="bf",
        help="bf = descriptor kNN + ratio; flow = pyramidal LK tracking",
    )
    p.add_argument(
        "--ratio", type=float, default=None,
        help="Lowe ratio (default: 0.8 for SIFT per include/Sfm.h:60; 0.9 "
        "for the binary AKAZE/ORB descriptors, which need a looser test)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--viz", action="store_true",
        help="dump visualization PNGs (keypoints, baseline matches, cloud "
        "views, depth maps) — the artifact form of the reference's "
        "blocking viewers (src/Sfm.cpp:276-296,416-464,1385-1397)",
    )
    p.add_argument(
        "--no-ba-every-view", action="store_true",
        help="only run the final global bundle adjustment",
    )
    p.add_argument(
        "--checkpoint", default=None,
        help="path to save/load the reconstruction state (resume support)",
    )
    p.add_argument(
        "--coordinator", default=None, metavar="HOST:PORT",
        help="multi-host mode: jax.distributed coordinator address. Launch "
        "one process per host with identical arguments plus --num-processes/"
        "--process-id; the sfm stage then runs the host-sharded input "
        "pipeline + multi-host global BA (parallel/distributed."
        "run_sfm_multihost)",
    )
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(levelname).1s %(name)s: %(message)s",
    )
    log = logging.getLogger("cli")
    os.makedirs(args.output, exist_ok=True)
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]

    if args.coordinator is not None:
        # Must run before anything initializes a JAX backend.
        from sfm_danpipeline_tpu.parallel import distributed as D

        D.initialize(args.coordinator, args.num_processes, args.process_id)

    import numpy as np

    import sfm_danpipeline_tpu  # noqa: F401
    from sfm_danpipeline_tpu.config import PipelineConfig
    from sfm_danpipeline_tpu.io.calibration import load_calibration
    from sfm_danpipeline_tpu.io.images import load_images
    from sfm_danpipeline_tpu.io.native import write_ply_fast as write_ply
    from sfm_danpipeline_tpu.io.ply import write_pcd

    cfg = PipelineConfig()
    # Per-detector strict ratio: binary MLDB/BRIEF descriptors (AKAZE/ORB)
    # need a looser Lowe test than SIFT's 0.8 (include/Sfm.h:60).
    ratio = args.ratio
    if ratio is None:
        ratio = 0.9 if args.detector in ("akaze", "orb") else 0.8
    cfg = dataclasses.replace(
        cfg,
        max_points=args.max_points,
        features=dataclasses.replace(
            cfg.features,
            max_keypoints=args.max_keypoints,
            detector=args.detector,
        ),
        matching=dataclasses.replace(
            cfg.matching, ratio=ratio, method=args.matcher
        ),
        geometry=dataclasses.replace(cfg.geometry, seed=args.seed),
    )

    images = load_images(args.images, cfg.images)
    intrinsics = load_calibration(args.calibration)
    log.info("%d images @ %s, fx=%.1f", images.n_images, images.shape,
             intrinsics.fx)

    metrics_path = os.path.join(args.output, "metrics.jsonl")
    mfile = open(metrics_path, "a")

    def emit(stage: str, payload: dict):
        rec = {"stage": stage, "ts": time.time(), **payload}
        mfile.write(json.dumps(rec) + "\n")
        mfile.flush()

    from sfm_danpipeline_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    points = colors = None
    state = None
    dres = None

    if "sfm" not in stages and args.checkpoint and os.path.exists(args.checkpoint):
        # Resume: analysis/dense stages run from a saved reconstruction.
        from sfm_danpipeline_tpu.utils.checkpoint import load_state

        state, _ = load_state(args.checkpoint)
        valid = np.asarray(state.points_valid)
        points = np.asarray(state.points_xyz)[valid]
        colors = np.asarray(state.points_rgb)[valid]
        log.info("resumed %d points from %s", len(points), args.checkpoint)

    if "sfm" in stages:
        from sfm_danpipeline_tpu.pipeline.sfm import SfMPipeline

        with timer.stage("sfm"):
            # checkpoint_path enables per-view mid-run checkpointing AND
            # auto-resume from a previous kill (SURVEY.md §5).
            if args.coordinator is not None:
                from sfm_danpipeline_tpu.parallel import distributed as D

                res = D.run_sfm_multihost(
                    images, intrinsics, cfg,
                    run_ba_every_view=not args.no_ba_every_view,
                    checkpoint_path=args.checkpoint,
                )
            else:
                res = SfMPipeline(cfg, checkpoint_path=args.checkpoint).run(
                    images, intrinsics,
                    run_ba_every_view=not args.no_ba_every_view,
                )
        state = res.state
        points, colors = res.points, res.colors
        emit("sfm", res.metrics)
        write_ply(
            os.path.join(args.output, "sparse.ply"), points, colors
        )
        if args.viz:
            from sfm_danpipeline_tpu.utils import viz

            vdir = os.path.join(args.output, "viz")
            os.makedirs(vdir, exist_ok=True)
            kp = res.keypoints
            # Raw detections align with the raw (possibly distorted)
            # images; kp.xy is canonicalized to ideal pixels (ADVICE r2).
            draw_xy = res.raw_xy if res.raw_xy is not None else np.asarray(kp.xy)
            for i in range(images.n_images):
                viz.draw_keypoints(
                    os.path.join(vdir, f"keypoints_{i:04d}.png"),
                    np.asarray(images.color[i]),
                    draw_xy[i],
                    np.asarray(kp.valid[i]),
                )
            if res.baseline_matches is not None:
                bi = int(res.metrics["baseline_pair_i"])
                bj = int(res.metrics["baseline_pair_j"])
                xa, xb, mv = res.baseline_matches
                viz.draw_matches(
                    os.path.join(vdir, f"matches_{bi:04d}_{bj:04d}.png"),
                    np.asarray(images.color[bi]),
                    np.asarray(images.color[bj]),
                    xa, xb, mv,
                )
            viz.save_cloud_views(
                os.path.join(vdir, "sparse_cloud.png"), points, colors
            )
            log.info("viz: artifacts in %s", vdir)
        cams = {
            "registered_views": res.registered_views,
            "focal": float(res.state.focal),
            "cameras": np.asarray(res.state.cameras).tolist(),
        }
        with open(os.path.join(args.output, "cameras.json"), "w") as f:
            json.dump(cams, f, indent=1)
        if args.checkpoint:
            from sfm_danpipeline_tpu.utils.checkpoint import save_state

            save_state(args.checkpoint, res.state)
        log.info("sfm: %d points -> sparse.ply", len(points))

    if "dense" in stages:
        try:
            from sfm_danpipeline_tpu.mvs.pipeline import densify

            if state is None:
                log.error("dense stage requires sfm stage (or a checkpoint)")
                return 1
            with timer.stage("dense"):
                dres = densify(images, intrinsics, state, cfg.mvs)
            points, colors = dres.points, dres.colors
            emit("dense", dres.metrics)
            write_ply(
                os.path.join(args.output, "dense.ply"), points, colors
            )
            # MAP3D.pcd: the reference's on-disk artifact (src/Sfm.cpp:80).
            write_pcd(
                os.path.join(args.output, "MAP3D.pcd"), points, colors
            )
            log.info("dense: %d points -> dense.ply, MAP3D.pcd", len(points))
            if args.viz:
                from sfm_danpipeline_tpu.utils import viz

                vdir = os.path.join(args.output, "viz")
                os.makedirs(vdir, exist_ok=True)
                for i, dm in enumerate(np.asarray(dres.depth_maps)):
                    viz.save_depth_map(
                        os.path.join(vdir, f"depth_{i:04d}.png"), dm
                    )
                viz.save_cloud_views(
                    os.path.join(vdir, "dense_cloud.png"), points, colors
                )
        except ImportError:
            log.warning("dense stage not available yet; skipping")

    if "filter" in stages and points is not None and len(points) > 0:
        # Cloud filtering between dense and mesh/segment — the reference's
        # cloudPointFilter + removePoints (src/Sfm.cpp:1323-1345). Its
        # PassThrough window and outlier radius are in the reference's
        # metric gauge; SfM output lives in an arbitrary gauge, so each
        # filter is gated: when it would discard nearly the whole cloud it
        # is the wrong frame and is skipped (same guard as segmentation's
        # z-window below).
        import jax.numpy as _jnp

        from sfm_danpipeline_tpu.analysis.filtering import (
            passthrough_mask,
            radius_outlier_mask,
        )

        n0 = len(points)
        valid = _jnp.ones(n0, bool)
        pts_j = _jnp.asarray(points)
        m = passthrough_mask(
            pts_j, cfg.analysis.passthrough_axis,
            cfg.analysis.passthrough_min, cfg.analysis.passthrough_max,
            valid,
        )
        if float(_jnp.mean(m)) >= 0.05:
            valid = m
        else:
            log.warning(
                "filter: PassThrough %s in [%g, %g] keeps %.2f%% — wrong "
                "gauge; skipping it",
                cfg.analysis.passthrough_axis, cfg.analysis.passthrough_min,
                cfg.analysis.passthrough_max, 100.0 * float(_jnp.mean(m)),
            )
        # Radius-outlier removal scaled to the cloud: the reference's
        # absolute r=0.07 assumes its gauge; use it when sane, else fall
        # back to 1% of the bounding-box diagonal with a small neighbor
        # minimum.
        diag = float(np.linalg.norm(points.max(0) - points.min(0)))
        radius, min_nb = cfg.analysis.outlier_radius, cfg.analysis.outlier_min_neighbors
        m = radius_outlier_mask(pts_j, valid, radius, min_nb)
        # Fallback trigger compares against the PassThrough-surviving count,
        # not the pre-filter total — otherwise a legitimately aggressive
        # PassThrough conflates the two filters (ADVICE r2).
        n_pass = float(_jnp.sum(valid))
        if float(_jnp.sum(m)) < 0.05 * n_pass:
            radius, min_nb = 0.01 * diag, 3
            m = radius_outlier_mask(pts_j, valid, radius, min_nb)
            log.warning(
                "filter: reference radius-outlier params keep too little; "
                "using r=%.4g, >=%d neighbors", radius, min_nb
            )
        keep = np.asarray(m)
        points = points[keep]
        if colors is not None:
            colors = colors[keep]
        emit("filter", {"n_before": n0, "n_after": int(keep.sum())})
        log.info("filter: %d -> %d points", n0, int(keep.sum()))
        write_ply(
            os.path.join(args.output, "filtered.ply"), points, colors
        )

    if "mesh" in stages:
        # Reference meshing stage (src/Sfm.cpp:1347-1383); here TSDF +
        # marching tetrahedra over the dense depth maps.
        if dres is None or state is None:
            log.warning("mesh stage requires the dense stage; skipping")
        else:
            from sfm_danpipeline_tpu.mvs.meshing import (
                mesh_from_depth_maps,
                write_obj,
            )
            from sfm_danpipeline_tpu.ops.lie import exp_so3
            import jax.numpy as _jnp

            scale = 0.5 ** cfg.mvs.level
            R = np.asarray(exp_so3(state.cameras[:, :3]))
            t = np.asarray(state.cameras[:, 3:])
            mesh = mesh_from_depth_maps(
                dres.depth_maps,
                R,
                t,
                intrinsics.scaled(scale).K,
                np.asarray(state.camera_valid),
                grid=2 ** cfg.analysis.mesh_poisson_depth,
            )
            write_obj(os.path.join(args.output, "mesh.obj"), mesh)
            emit("mesh", {"n_vertices": len(mesh.vertices),
                          "n_faces": len(mesh.faces)})
            log.info("mesh: %d verts, %d faces -> mesh.obj",
                     len(mesh.vertices), len(mesh.faces))

    if points is None:
        log.error("no cloud produced/loaded; nothing to analyze")
        return 1

    import jax.numpy as jnp

    if "segment" in stages:
        from sfm_danpipeline_tpu.analysis.segmentation import segment_cloud

        # The reference hard-codes a z in [0,14] pass-through for its
        # agisoft tree clouds (src/Segmentation.cpp:24-28). SfM output lives
        # in an arbitrary gauge, so when the window would discard nearly the
        # whole cloud it is clearly the wrong frame — disable it rather than
        # reproduce the reference's exit-on-empty failure mode.
        z_min, z_max = cfg.analysis.seg_z_min, cfg.analysis.seg_z_max
        z = points[:, 2]
        kept = float(np.mean((z >= z_min) & (z <= z_max)))
        if kept < 0.05:
            log.warning(
                "segment: z-window [%g, %g] keeps %.2f%% of the cloud — "
                "cloud is in a different gauge; disabling the pass-through",
                z_min, z_max, 100.0 * kept,
            )
            z_min, z_max = -np.inf, np.inf
        seg = segment_cloud(
            jnp.asarray(points),
            jnp.asarray(colors if colors is not None else np.zeros_like(points)),
            jnp.ones(len(points), bool),
            z_min=z_min,
            z_max=z_max,
            distance=cfg.analysis.seg_distance,
            point_color=cfg.analysis.seg_point_color,
            region_color=cfg.analysis.seg_region_color,
            min_cluster=min(cfg.analysis.seg_min_cluster, max(len(points) // 10, 1)),
        )
        n = int(seg.n_clusters)
        emit("segment", {"n_clusters": n})
        np.save(os.path.join(args.output, "segmentation_labels.npy"),
                np.asarray(seg.labels))
        if n == 0:
            # Reference exits on zero clusters (src/Segmentation.cpp:44-48).
            log.error("segmentation found 0 clusters")
            return 1
        log.info("segmentation: %d clusters", n)

    if "dendrometry" in stages:
        from sfm_danpipeline_tpu.analysis.dendrometry import estimate

        rep = estimate(jnp.asarray(points), jnp.ones(len(points), bool))
        emit("dendrometry", rep)
        with open(os.path.join(args.output, "dendrometry.json"), "w") as f:
            json.dump(rep, f, indent=1)
        log.info("dendrometry: total height %.3f", rep["total_height"])

    emit("timing", timer.as_metrics())
    mfile.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
