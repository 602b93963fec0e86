#!/usr/bin/env python
"""Diagnostic run of the temple sequence on CPU (not part of the package)."""
import logging
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache_cpu"))

logging.basicConfig(level=logging.INFO, format="%(message)s")

import numpy as np

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.calibration import load_calibration
from sfm_danpipeline_tpu.io.images import load_images
from sfm_danpipeline_tpu.pipeline.sfm import SfMPipeline
from sfm_danpipeline_tpu.utils.metrics import camera_centers

TEMPLE = "/root/reference/data/temple"

images = load_images(TEMPLE)
calib = load_calibration(os.path.join(TEMPLE, "camera_calibration_template.xml"))
cfg = PipelineConfig().replace(max_points=8192)
res = SfMPipeline(cfg).run(images, calib)

print("=== RESULT ===")
print("registered:", res.registered_views)
for k, v in sorted(res.metrics.items()):
    print(f"  {k}: {v}")
kp = res.keypoints
print("kp yield per image:", np.sum(np.asarray(kp.valid), -1))
regs = res.registered_views
centers = camera_centers(np.asarray(res.state.cameras))[regs]
gaps = np.linalg.norm(np.diff(centers, axis=0), axis=1)
print("camera gaps:", np.round(gaps, 3))
print("arc check:", "PASS" if len(gaps) >= 2 and gaps.max() < 5 * np.median(gaps) else "FAIL")

# --- visual sanity dump: top view of cloud + cameras
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from sfm_danpipeline_tpu.ops.lie import exp_so3
import jax.numpy as jnp

st = res.state
valid = np.asarray(st.points_valid)
X = np.asarray(st.points_xyz)[valid]
tf = np.asarray(st.track_feat)[valid]
in_b = (tf[:, 6:10] >= 0).any(1)
in_a = (tf[:, :6] >= 0).any(1)
C = camera_centers(np.asarray(st.cameras))
fig, axes = plt.subplots(1, 3, figsize=(18, 6))
for ax, (i, j, ttl) in zip(axes, [(0, 2, "x-z"), (0, 1, "x-y"), (1, 2, "y-z")]):
    ax.scatter(X[in_a & ~in_b, i], X[in_a & ~in_b, j], s=1, c="steelblue", label="A only")
    ax.scatter(X[~in_a & in_b, i], X[~in_a & in_b, j], s=1, c="indianred", label="B only")
    ax.scatter(X[in_a & in_b, i], X[in_a & in_b, j], s=4, c="green", label="cross")
    ax.plot(C[:, i], C[:, j], "k.-")
    for v in range(10):
        ax.annotate(str(v), (C[v, i], C[v, j]))
    ax.set_title(ttl); ax.axis("equal")
axes[0].legend()
plt.savefig("/tmp/temple_merged.png", dpi=80, bbox_inches="tight")
print("cross tracks:", int((in_a & in_b).sum()), "| A-only:", int((in_a & ~in_b).sum()), "| B-only:", int((~in_a & in_b).sum()))
