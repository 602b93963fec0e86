"""FLOPs models for the hot kernels — the MFU/roofline observability the
north star asks for ("kernels at speed-of-light per chip").

These are analytic counts of the arithmetic the algorithms REQUIRE, so
measured_time vs model gives an honest model-FLOPs-utilization (MFU)
number. The SIFT stages are gather/VPU-bound (their arithmetic intensity
is low); matching is the MXU workload.
"""
from __future__ import annotations

import math

from sfm_danpipeline_tpu.config import FeatureConfig, MatchConfig

# Peak dense f32 throughput of one TPU v5e chip (bf16 peak is ~197e12;
# these kernels run f32 on VPU/MXU).
TPU_V5E_PEAK_F32 = 98.0e12


def sift_flops(h: int, w: int, config: FeatureConfig = FeatureConfig()) -> float:
    """Arithmetic of one image's detect+describe (pyramid convolutions +
    orientation/descriptor sampling)."""
    if config.upsample:
        h, w = 2 * h, 2 * w
    flops = 0.0
    k = 2.0 ** (1.0 / config.n_scales_per_octave)
    for o in range(config.n_octaves):
        hh, ww = h >> o, w >> o
        sp = config.sigma0
        for i in range(1, config.n_scales_per_octave + 3):
            st = config.sigma0 * (k ** i)
            si = math.sqrt(max(st * st - sp * sp, 1e-12))
            taps = 2 * max(1, int(math.ceil(3.0 * si))) + 1
            flops += 2.0 * 2 * taps * hh * ww  # separable, MAC = 2 flops
            sp = st
        # DoG + extrema reduce_window: ~30 flops/voxel over S+2 levels.
        flops += 30.0 * (config.n_scales_per_octave + 2) * hh * ww
    # Orientation (K candidates x 256 samples) + descriptors (2K rows):
    # bilinear gather (8 flops) x 2 gradients + ~20 flops of binning math.
    K = config.max_keypoints
    flops += (K + 2 * K) * 256.0 * (2 * 8 + 20)
    return flops


def matching_flops(
    n_pairs: int, k: int = 2048, d: int = 128
) -> float:
    """All-pairs descriptor distance: one K x K x D matmul per pair."""
    return 2.0 * n_pairs * k * k * d


def mfu(flops: float, seconds: float, peak: float = TPU_V5E_PEAK_F32) -> float:
    """Model-FLOPs utilization in [0, 1]."""
    return flops / max(seconds, 1e-12) / peak
