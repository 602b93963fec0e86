"""Real 2-process multi-host integration test.

Spawns two fresh Python processes that rendezvous via
jax.distributed.initialize on localhost, build a GLOBAL mesh spanning both,
and run the multi-host observation-sharded bundle adjuster — each process
contributing its own observation shard. The solution must match the
single-process solve (parallel/distributed.py is the scaffold the verdict
required beyond the simulated single-process mesh)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, sys.argv[4])

from sfm_danpipeline_tpu.parallel import distributed as D

D.initialize(f"localhost:{port}", nproc, pid)

import numpy as np
import jax

assert jax.process_count() == nproc

from sfm_danpipeline_tpu.config import BAConfig
from sfm_danpipeline_tpu.ba.problem import make_problem

# Deterministic synthetic BA problem, identical on both processes.
rng = np.random.default_rng(42)
n_cam, n_pts = 4, 96
pts = rng.uniform(-1, 1, (n_pts, 3)); pts[:, 2] += 4.0
cams = np.zeros((n_cam, 6), np.float32)
cams[:, 3] = np.linspace(0, 0.3, n_cam)
obs_cam = np.repeat(np.arange(n_cam), n_pts).astype(np.int32)
obs_pt = np.tile(np.arange(n_pts), n_cam).astype(np.int32)
f = 120.0
proj = []
for c in range(n_cam):
    cp = pts + cams[c, 3:]
    proj.append(f * cp[:, :2] / cp[:, 2:3])
obs_xy = np.concatenate(proj) + rng.normal(0, 0.3, (n_cam * n_pts, 2))
obs_w = np.ones(n_cam * n_pts, np.float32)
fix = np.zeros(n_cam, bool); fix[0] = True
noisy_pts = pts + rng.normal(0, 0.02, pts.shape)

# THIS host's shard of the observations (contiguous block, equal length).
O = len(obs_cam)
half = O // nproc
s, e = pid * half, (pid + 1) * half
local = make_problem(
    cameras=cams, focal=f, points=noisy_pts,
    obs_cam=obs_cam[s:e], obs_pt=obs_pt[s:e], obs_xy=obs_xy[s:e],
    obs_w=obs_w[s:e], fix_cam=fix,
)
res = D.run_ba_multihost(local, BAConfig(max_iterations=40))

# Reference: single-process full solve (local to this process). f32 psum
# reduction order differs across process counts, so LM accept/reject
# decisions can diverge mid-trajectory — compare CONVERGED quality (cost)
# and coarse parameter agreement, not bitwise params.
from sfm_danpipeline_tpu.ba.solver import run_ba
full = make_problem(
    cameras=cams, focal=f, points=noisy_pts,
    obs_cam=obs_cam, obs_pt=obs_pt, obs_xy=obs_xy, obs_w=obs_w,
    fix_cam=fix,
)
ref = run_ba(full, BAConfig(max_iterations=40))
c_mh, c_ref = float(res.final_cost), float(ref.final_cost)
assert c_mh < float(res.initial_cost)
assert abs(c_mh - c_ref) < 0.02 * max(c_ref, 1.0), (c_mh, c_ref)
# Loose parameter sanity only: with just camera 0 pinned the problem keeps
# a scale gauge, so equally-converged solutions differ in params.
err = float(np.abs(np.asarray(res.cameras) - np.asarray(ref.cameras)).max())
assert err < 0.2, f"multihost vs single param gap {err}"
print(f"proc {pid}: OK (cost {c_mh:.2f} vs {c_ref:.2f}, cam gap {err:.2e})",
      flush=True)
"""


@pytest.mark.slow
def test_two_process_ba_matches_single():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    # Must be set BEFORE interpreter start: the image's sitecustomize
    # registers the axon TPU backend at startup (earlier than any worker
    # code), which breaks jax.distributed rendezvous on CPU.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), "2", str(port), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK" in out
