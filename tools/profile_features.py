#!/usr/bin/env python
"""Per-stage TPU timing + FLOPs/MFU model for the SIFT detector.

Run from the repo root (no PYTHONPATH — it breaks the axon registration):
    python tools/profile_features.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import math

import numpy as np
import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.images import load_images
from sfm_danpipeline_tpu.ops import sift as S


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    print("backend:", jax.default_backend())
    cfg = PipelineConfig().features
    images = load_images("/root/reference/data/temple")
    gray = jnp.asarray(images.gray[4])

    # --- stage jits
    @jax.jit
    def stage_pyramid(g):
        base = S._upsample2(g)
        init_blur = cfg.init_blur * 2.0
        sd = math.sqrt(max(cfg.sigma0**2 - init_blur**2, 0.01))
        base = S.gaussian_blur(base, sd)
        outs = []
        oi = base
        for o in range(cfg.n_octaves):
            gauss = S.build_gaussian_octave(oi, cfg)
            outs.append(gauss)
            oi = S._downsample2(gauss[cfg.n_scales_per_octave])
        return outs

    pyr = stage_pyramid(gray)

    def stage_detect(pyr_list):
        outs = []
        for o, gauss in enumerate(pyr_list):
            k_oct = max(64, int(2048 * S._OCTAVE_BUDGET[min(o, 3)]))
            outs.append(S._detect_octave(gauss, k_oct, cfg))
        return outs

    stage_detect_j = jax.jit(stage_detect)
    dets = stage_detect_j(pyr)

    def stage_describe(pyr_list, det_list):
        outs = []
        for gauss, det in zip(pyr_list, det_list):
            x, y, gl, sig, resp, valid = det
            outs.append(
                S._describe_octave(gauss, x, y, gl, sig, resp, valid, cfg)
            )
        return outs

    stage_describe_j = jax.jit(stage_describe)

    t_pyr, _ = timeit(stage_pyramid, gray)
    t_det, _ = timeit(stage_detect_j, pyr)
    t_desc, _ = timeit(stage_describe_j, pyr, dets)
    t_full, _ = timeit(
        lambda g: S._detect_impl(g, cfg, cfg.max_keypoints), gray
    )
    print(f"pyramid:    {t_pyr*1000:7.1f} ms")
    print(f"detect:     {t_det*1000:7.1f} ms (extrema+topk+refine)")
    print(f"describe:   {t_desc*1000:7.1f} ms (orientation+descriptor)")
    print(f"full image: {t_full*1000:7.1f} ms")

    # batch-of-10 (the production call)
    gray_b = jnp.asarray(images.gray)
    t_batch, kp = timeit(
        lambda g: S.detect_and_compute_batch(g, cfg), gray_b, reps=3
    )
    print(f"batch(10):  {t_batch*1000:7.1f} ms -> {t_batch*100:.1f} ms/image")

    # --- FLOPs model (pyramid convolutions dominate arithmetic):
    # separable blur: 2 passes x ~(6*sigma+1) taps x H x W MACs per level.
    H0, W0 = 960, 1280
    flops = 0.0
    k = 2.0 ** (1.0 / cfg.n_scales_per_octave)
    for o in range(cfg.n_octaves):
        h, w = H0 >> o, W0 >> o
        sp = cfg.sigma0
        for i in range(1, cfg.n_scales_per_octave + 3):
            st = cfg.sigma0 * (k ** i)
            si = math.sqrt(max(st * st - sp * sp, 1e-12))
            taps = 2 * max(1, int(math.ceil(3.0 * si))) + 1
            flops += 2 * 2 * taps * h * w  # 2 passes, MAC=2 flops
            sp = st
    # descriptor/orientation gathers: ~256 samples x 2 grads x 4 taps x
    # (2048 ori + 4096 desc) lookups, each ~8 flops of interpolation math.
    flops += 8.0 * 4 * 2 * 256 * (2048 + 4096)
    mfu = flops / max(t_full, 1e-9) / 197e12  # v5e bf16 peak ~197 TFLOP/s
    print(f"FLOPs model: {flops/1e9:.2f} GFLOP -> MFU {100*mfu:.3f}% "
          f"(f32 on VPU; gathers dominate wall, not FLOPs)")
    y = np.sum(np.asarray(kp.valid), -1)
    print("yield:", y, "mean", y.mean())


if __name__ == "__main__":
    main()
