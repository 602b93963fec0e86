"""sfm_danpipeline_tpu — TPU-native incremental Structure-from-Motion.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
codebydant/sfM_danPipeline (an OpenCV/Ceres/PCL C++ pipeline): SIFT-style
features, all-pairs matching, essential-matrix + PnP pose recovery, DLT
triangulation, Levenberg-Marquardt bundle adjustment with Schur-complement
elimination, plane-sweep dense reconstruction, and the analysis tail
(filtering, segmentation, dendrometry) — designed TPU-first: fixed shapes,
vmapped RANSAC, Pallas kernels on the hot paths, and psum-sharded BA over a
device mesh.
"""

import jax as _jax

# Geometry estimation (8-point DLT, triangulation, PnP, Schur solves) runs on
# small, ill-conditioned systems where TPU's default bf16-input matmul loses
# the answer entirely (observed: 0 essential-matrix inliers on real data).
# Force full-f32 matmuls globally; the few large throughput matmuls (descriptor
# distance) opt back down locally where profiling justifies it.
_jax.config.update("jax_default_matmul_precision", "highest")

from sfm_danpipeline_tpu.config import (
    DEFAULT_CONFIG,
    PipelineConfig,
)

__version__ = "0.1.0"

__all__ = ["DEFAULT_CONFIG", "PipelineConfig", "__version__"]
