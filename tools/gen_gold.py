#!/usr/bin/env python
"""Regenerate bench_gold_trajectory.json from a gate-passing CPU run."""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_cpu"))

import numpy as np

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.calibration import load_calibration
from sfm_danpipeline_tpu.io.images import load_images
from sfm_danpipeline_tpu.pipeline.sfm import SfMPipeline
from sfm_danpipeline_tpu.utils.metrics import camera_centers

TEMPLE = "/root/reference/data/temple"

images = load_images(TEMPLE)
calib = load_calibration(os.path.join(TEMPLE, "camera_calibration_template.xml"))
res = SfMPipeline(PipelineConfig().replace(max_points=8192)).run(images, calib)
m = res.metrics
ok = (
    m["n_registered"] == images.n_images
    and m["ba_rms_px"] < 1.0
    and m["n_points"] >= 1000
    and m.get("n_cross_tracks", 0) >= 20
    and m.get("merge_cross_med_px", 99.0) < 4.0
)
C = camera_centers(np.asarray(res.state.cameras))
centroid = res.points.mean(axis=0)
r = np.linalg.norm(C - centroid, axis=1)
ok = ok and r.max() / r.min() < 1.35
print("gates:", ok, "| radii:", np.round(r, 2), "| rms:", round(m["ba_rms_px"], 3))
if not ok:
    sys.exit(1)
out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "bench_gold_trajectory.json")
with open(out, "w") as f:
    json.dump({
        "note": "camera centers of a gate-verified temple reconstruction "
                "(CPU, round 3); ATE compares via Umeyama alignment so the "
                "gauge is irrelevant",
        "centers": C.tolist(),
    }, f, indent=1)
print("wrote", out)
