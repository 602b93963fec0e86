import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.images import load_images
from sfm_danpipeline_tpu.ops.sift import detect_and_compute_batch

print("backend:", jax.default_backend())
cfg = PipelineConfig().features
images = load_images("/root/reference/data/temple")
g = np.asarray(images.gray)
# vary input per rep: add per-rep noise so the tunnel can't memoize
variants = [g + np.float32(1e-6 * i) for i in range(6)]

# 1) upload only
for tag in ("upload", "compute(resident)", "upload+compute"):
    ts = []
    for i in range(6):
        t0 = time.time()
        if tag == "upload":
            d = jax.device_put(variants[i]); jax.block_until_ready(d)
        elif tag == "compute(resident)":
            if i == 0:
                dres = [jax.device_put(v) for v in variants]
                jax.block_until_ready(dres)
            kp = detect_and_compute_batch(dres[i], cfg)
            jax.block_until_ready(kp.descriptors)
        else:
            kp = detect_and_compute_batch(jnp.asarray(variants[i]), cfg)
            jax.block_until_ready(kp.descriptors)
        ts.append(time.time() - t0)
    # first rep may compile; report min of later reps
    print(f"{tag}: min {min(ts[1:])*1000:.0f} ms, all", [f"{t*1000:.0f}" for t in ts])
