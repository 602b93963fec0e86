#!/usr/bin/env python
# Run from the repo root (PYTHONPATH breaks the axon TPU registration).
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.images import load_images
from sfm_danpipeline_tpu.ops.sift import detect_and_compute_batch
from sfm_danpipeline_tpu.ops.matching import match_all_pairs

print("backend:", jax.default_backend())
cfg = PipelineConfig()
images = load_images("/root/reference/data/temple")
kp = detect_and_compute_batch(jnp.asarray(images.gray), cfg.features)
jax.block_until_ready(kp.descriptors)
V = 10
pi = np.asarray([i for i in range(V-1) for j in range(i+1,V)], np.int32)
pj = np.asarray([j for i in range(V-1) for j in range(i+1,V)], np.int32)
for use_pallas in (False, True):
    m = match_all_pairs(kp.descriptors, kp.valid, jnp.asarray(pi), jnp.asarray(pj),
        ratio=0.9, max_matches=1024, use_pallas=use_pallas, strict_ratio=0.8)
    jax.block_until_ready(m.idx_a)  # warmup/compile
    ts = []
    for _ in range(5):
        t0 = time.time()
        m = match_all_pairs(kp.descriptors, kp.valid, jnp.asarray(pi), jnp.asarray(pj),
            ratio=0.9, max_matches=1024, use_pallas=use_pallas, strict_ratio=0.8)
        jax.block_until_ready(m.idx_a)
        ts.append(time.time() - t0)
    print(f"use_pallas={use_pallas}: best {min(ts)*1000:.1f} ms, med {sorted(ts)[2]*1000:.1f} ms over 45 pairs")
