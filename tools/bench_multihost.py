"""Multi-host scaling bench (CPU proxy for the N-host story).

Runs BOTH granularities on the temple sequence at N=1 and N=2 processes,
each process PINNED TO ONE CORE (taskset) so the 2-core box measures
strong scaling instead of thread-pool contention:

  1. per-stage: host-sharded features + pair-block matching (the
     embarrassingly parallel stages), steady-state post-compile;
  2. END-TO-END: the full `run_sfm_multihost` driver wall-clock —
     sharded input pipeline + replicated incremental loop + multi-host
     global BA polish — the frames/s efficiency number BASELINE.md's
     >=70% target names (VERDICT r3 weak #6: per-stage numbers alone
     overstate scaling because the replicated loop is Amdahl's serial
     fraction).

Prints one JSON line per configuration plus the efficiency summary.

Usage: python tools/bench_multihost.py [--e2e-only|--stages-only]
"""
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys, time, json
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, sys.argv[4])

from sfm_danpipeline_tpu.parallel import distributed as D
if nproc > 1:
    D.initialize(f"localhost:{port}", nproc, pid)

import jax
from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.images import load_images

images = load_images("/root/reference/data/temple")
cfg = PipelineConfig()

def one_round():
    t0 = time.time()
    kp = D.compute_features_multihost(images, cfg)
    jax.block_until_ready(kp.descriptors)
    t_feat = time.time() - t0
    t0 = time.time()
    m = D.compute_matches_multihost(kp, images.n_images, cfg)
    jax.block_until_ready(m.idx_a)
    return t_feat, time.time() - t0

one_round()  # warmup: compiles
rounds = [one_round() for _ in range(2)]
t_feat = min(r[0] for r in rounds)
t_match = min(r[1] for r in rounds)
if pid == 0:
    print(json.dumps({"nproc": nproc, "t_features": t_feat,
                      "t_matching": t_match}), flush=True)
"""

_WORKER_E2E = r"""
import os, sys, time, json
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, sys.argv[4])

from sfm_danpipeline_tpu.parallel import distributed as D
if nproc > 1:
    D.initialize(f"localhost:{port}", nproc, pid)

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.calibration import load_calibration
from sfm_danpipeline_tpu.io.images import load_images

images = load_images("/root/reference/data/temple")
calib = load_calibration(
    "/root/reference/data/temple/camera_calibration_template.xml")
cfg = PipelineConfig()

def one_round():
    t0 = time.time()
    res = D.run_sfm_multihost(images, calib, cfg)
    return time.time() - t0, len(res.registered_views), len(res.points)

one_round()  # warmup: compiles
best = min(one_round() for _ in range(3))
if pid == 0:
    t, nreg, npts = best
    print(json.dumps({"nproc": nproc, "t_e2e": t,
                      "frames_per_s": images.n_images / t,
                      "n_registered": nreg, "n_points": npts}), flush=True)
"""


def run_group(nproc: int, worker: str = _WORKER, timeout: int = 900) -> dict:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i % os.cpu_count()), sys.executable,
             "-c", worker, str(i), str(nproc), str(port), REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(nproc)
    ]
    out0 = None
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=timeout)
        if p.returncode != 0:
            raise RuntimeError(f"proc {i} failed:\n{out.decode()[-3000:]}")
        if i == 0:
            out0 = out.decode()
    line = [ln for ln in out0.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    do_stages = "--e2e-only" not in sys.argv
    do_e2e = "--stages-only" not in sys.argv
    if do_stages:
        r1 = run_group(1)
        print(json.dumps(r1))
        r2 = run_group(2)
        print(json.dumps(r2))
        for stage in ("t_features", "t_matching"):
            eff = r1[stage] / (2 * r2[stage])
            print(json.dumps({
                "stage": stage, "t_1proc_s": round(r1[stage], 3),
                "t_2proc_s": round(r2[stage], 3),
                "speedup": round(r1[stage] / r2[stage], 3),
                "scaling_efficiency": round(eff, 3),
            }))
    if do_e2e:
        e1 = run_group(1, _WORKER_E2E, timeout=3600)
        print(json.dumps(e1))
        e2 = run_group(2, _WORKER_E2E, timeout=3600)
        print(json.dumps(e2))
        eff = e1["t_e2e"] / (2 * e2["t_e2e"])
        print(json.dumps({
            "stage": "end_to_end", "t_1proc_s": round(e1["t_e2e"], 3),
            "t_2proc_s": round(e2["t_e2e"], 3),
            "fps_1proc": round(e1["frames_per_s"], 4),
            "fps_2proc": round(e2["frames_per_s"], 4),
            "speedup": round(e1["t_e2e"] / e2["t_e2e"], 3),
            "scaling_efficiency": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
