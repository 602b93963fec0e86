#!/usr/bin/env python
"""End-to-end SCALE benchmark past the 10-image temple (VERDICT r4
missing #5 / directive #6): a V-view synthetic textured courtyard ring
(utils/synthscene.py — real rendered images, exact ground-truth cameras)
through the FULL pipeline: SIFT -> O(V^2) matching -> incremental
PnP+BA -> rotation-averaging reinit (fires at >= rotavg_min_views on
image-derived correspondences) -> final BA.

Reports per-stage walls, frames/s, registration completeness, ATE vs the
synthetic ground truth, and the O(V^2) matching scaling row (V=10 vs V).

Usage:
  python tools/bench_scale.py [--views 50] [--small-views 10] [--ring 1.0]
"""
import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
)


def run_pipeline(scene, tag):
    import numpy as np

    from sfm_danpipeline_tpu.config import PipelineConfig
    from sfm_danpipeline_tpu.pipeline.sfm import SfMPipeline
    from sfm_danpipeline_tpu.utils.metrics import (
        aligned_rmse,
        camera_centers,
    )

    cfg = PipelineConfig()
    pipe = SfMPipeline(cfg)
    t0 = time.time()
    res = pipe.run(scene.images, scene.intrinsics)
    wall = time.time() - t0
    m = res.metrics
    V = scene.images.n_images
    regs = sorted(res.registered_views)
    ate = float("nan")
    ate_frac = float("nan")
    if len(regs) >= 3:
        c = camera_centers(np.asarray(res.state.cameras))[regs]
        g = scene.centers[regs]
        ate = aligned_rmse(c, g)
        diam = float(np.linalg.norm(g.max(0) - g.min(0)))
        ate_frac = ate / diam
    out = {
        "tag": tag,
        "n_views": V,
        "n_registered": len(regs),
        "n_points": int(m.get("n_points", 0)),
        "rms_px": round(float(m.get("ba_rms_px", -1)), 3),
        "ate_frac": round(ate_frac, 5),
        "rotavg_applied": m.get("rotavg_applied"),
        "wall_s": round(wall, 2),
        "frames_per_s": round(V / wall, 3),
        "stage_s": {
            k[2:]: round(v, 2)
            for k, v in sorted(m.items()) if k.startswith("t_")
        },
        "n_pairs": int(m.get("n_pairs", 0)),
        "ba_n_obs": int(m.get("ba_n_obs", 0)),
    }
    print(f"bench_scale[{tag}]: {json.dumps(out)}", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=50)
    ap.add_argument("--small-views", type=int, default=10)
    ap.add_argument("--ring", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from sfm_danpipeline_tpu.utils.synthscene import make_courtyard_scene

    print(f"bench_scale: backend={jax.default_backend()}", file=sys.stderr)
    t0 = time.time()
    big = make_courtyard_scene(
        n_views=args.views, ring_fraction=args.ring, seed=args.seed
    )
    small = make_courtyard_scene(
        n_views=args.small_views, ring_fraction=args.ring * args.small_views
        / args.views, seed=args.seed
    )
    print(
        f"bench_scale: rendered {args.views}+{args.small_views} views in "
        f"{time.time()-t0:.1f}s", file=sys.stderr,
    )

    small_out = run_pipeline(small, f"V{args.small_views}")
    big_out = run_pipeline(big, f"V{args.views}")

    # O(V^2) matching check: t_match scales with the pair count.
    r_pairs = big_out["n_pairs"] / max(small_out["n_pairs"], 1)
    t_small = small_out["stage_s"].get("matching", 0.0)
    t_big = big_out["stage_s"].get("matching", 0.0)
    print(
        json.dumps(
            {
                "metric": "scale_ring_frames_per_s",
                "value": big_out["frames_per_s"],
                "unit": "frames/s",
                "extra": {
                    "big": big_out,
                    "small": small_out,
                    "pair_ratio": round(r_pairs, 2),
                    "matching_time_ratio": round(
                        t_big / max(t_small, 1e-9), 2
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
