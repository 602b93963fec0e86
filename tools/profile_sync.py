#!/usr/bin/env python
"""Where does feature time go on the axon backend? Run from repo root."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.images import load_images
from sfm_danpipeline_tpu.ops.sift import detect_and_compute_batch

print("backend:", jax.default_backend())
cfg = PipelineConfig().features
images = load_images("/root/reference/data/temple")
g = np.asarray(images.gray)
for rep in range(3):
    gv = jnp.asarray(g + np.float32(1e-5 * (rep + 1)))
    jax.block_until_ready(gv)
    t0 = time.time()
    kp = detect_and_compute_batch(gv, cfg)
    t1 = time.time()
    jax.block_until_ready(kp.descriptors)
    t2 = time.time()
    _ = np.asarray(kp.descriptors)  # real device->host fetch
    t3 = time.time()
    print(f"rep{rep}: dispatch {1000*(t1-t0):.0f} ms | block {1000*(t2-t1):.0f} ms | fetch {1000*(t3-t2):.0f} ms")
