"""One-shot TPU timing of all three detectors (VERDICT r3 directive #9).

The reference selects SIFT / AKAZE / ORB by an int switch
(include/Sfm.h:40-61); r3 benchmarked only SIFT on TPU. This tool times
detect+describe for each detector on the temple batch (steady-state,
second call) plus the adjacent-pair match yield each detector's
descriptors produce, so the selector is a measured capability on TPU,
not just a CPU-tested code path.

Prints one JSON line per detector. Run ON TPU (no JAX_PLATFORMS
override) with the persistent compile cache:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/bench_detectors.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
)


def main():
    import jax
    import jax.numpy as jnp

    from sfm_danpipeline_tpu.config import PipelineConfig
    from sfm_danpipeline_tpu.io.images import load_images
    from sfm_danpipeline_tpu.ops.matching import match_pair

    images = load_images("/root/reference/data/temple")
    gray = jnp.asarray(images.gray)
    cfg = PipelineConfig()
    n = images.n_images
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    def detect(name, rep=0):
        # Inputs must VARY per rep: the axon backend memoizes identical
        # dispatches and a repeat call returns instantly without running
        # (ROUND3_NOTES measurement gotchas).
        g = gray + 1e-6 * (rep + 1)
        return _detect(name, g)

    def _detect(name, g):
        if name == "sift":
            from sfm_danpipeline_tpu.ops.sift import (
                detect_and_compute_batch,
            )

            return detect_and_compute_batch(g, cfg.features)
        if name == "akaze":
            from sfm_danpipeline_tpu.ops.akaze import (
                detect_and_compute_akaze_batch,
            )

            return detect_and_compute_akaze_batch(g, cfg.features)
        from sfm_danpipeline_tpu.ops.orb import (
            detect_and_compute_orb_batch,
        )

        return detect_and_compute_orb_batch(
            g, max_keypoints=cfg.features.max_keypoints
        )

    for name in ("sift", "akaze", "orb"):
        t0 = time.time()
        kp = detect(name, 0)
        float(jnp.sum(kp.valid))  # fetch: the only honest sync on axon
        t_warm = time.time() - t0
        t0 = time.time()
        kp = detect(name, 1)
        float(jnp.sum(kp.valid))
        t_steady = time.time() - t0
        ratio = 0.9 if name in ("akaze", "orb") else 0.8
        m = match_pair(
            kp.descriptors[0], kp.valid[0],
            kp.descriptors[1], kp.valid[1], ratio=ratio,
        )
        print(
            json.dumps(
                {
                    "detector": name,
                    "t_warmup_s": round(t_warm, 2),
                    "t_steady_s": round(t_steady, 3),
                    "ms_per_image": round(1000.0 * t_steady / n, 1),
                    "kp_mean": round(
                        float(jnp.mean(jnp.sum(kp.valid, -1))), 1
                    ),
                    "matches_pair01": int(m.count),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
