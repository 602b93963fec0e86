#!/usr/bin/env python
"""Stage timing with fresh inputs (the axon backend needs per-rep variation
and real block_until_ready). Run from repo root."""
import os, sys, time, math
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.images import load_images
from sfm_danpipeline_tpu.ops import sift as S

cfg = PipelineConfig().features
images = load_images("/root/reference/data/temple")
g = np.asarray(images.gray[4])

@jax.jit
def stage_pyramid(gr):
    base = S._upsample2(gr)
    sd = math.sqrt(max(cfg.sigma0**2 - (cfg.init_blur*2)**2, 0.01))
    base = S.gaussian_blur(base, sd)
    outs = []
    oi = base
    for o in range(cfg.n_octaves):
        ga = S.build_gaussian_octave(oi, cfg)
        outs.append(ga)
        oi = S._downsample2(ga[cfg.n_scales_per_octave])
    return outs

def det(pyr):
    return [S._detect_octave(ga, max(64, int(2048*S._OCTAVE_BUDGET[min(o,3)])), cfg)
            for o, ga in enumerate(pyr)]
det_j = jax.jit(det)

def desc(pyr, dets):
    return [S._describe_octave(ga, *d[:4], d[4], d[5], cfg) for ga, d in zip(pyr, dets)]
desc_j = jax.jit(desc)

def timed(fn, make_args, reps=3):
    fn(*make_args(0)) and None
    ts = []
    for r in range(1, reps+1):
        a = make_args(r)
        jax.block_until_ready(a)
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.time()-t0)
    return min(ts)

mk_img = lambda r: (jnp.asarray(g + np.float32(1e-5*r)),)
t_pyr = timed(stage_pyramid, mk_img)
pyrs = [stage_pyramid(jnp.asarray(g + np.float32(1e-5*r))) for r in range(4)]
for p in pyrs: jax.block_until_ready(p)
t_det = timed(det_j, lambda r: (pyrs[r % 4],))
dets = [det_j(p) for p in pyrs]
for d in dets: jax.block_until_ready(d)
t_desc = timed(desc_j, lambda r: (pyrs[r % 4], dets[r % 4]))
t_full = timed(lambda x: S._detect_impl(x, cfg, cfg.max_keypoints), mk_img)
print(f"pyramid  {t_pyr*1000:7.1f} ms")
print(f"detect   {t_det*1000:7.1f} ms")
print(f"describe {t_desc*1000:7.1f} ms")
print(f"full     {t_full*1000:7.1f} ms / image")
