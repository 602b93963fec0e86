"""2-process end-to-end multi-host SfM driver test.

Spawns two processes that rendezvous via jax.distributed.initialize and run
parallel/distributed.run_sfm_multihost on a 4-view temple subset: host-
sharded features, pair-block-sharded matching, replicated incremental loop,
observation-sharded global BA polish. Asserts (a) the sharded input
pipeline assembles EXACTLY the single-process arrays, (b) both processes
hold the identical reconstruction, (c) all views register."""
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

import dataclasses
import numpy as np
import jax, jax.numpy as jnp

assert jax.process_count() == nproc

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.io.images import load_images
from sfm_danpipeline_tpu.io.calibration import load_calibration
from sfm_danpipeline_tpu.ops.matching import match_all_pairs
from sfm_danpipeline_tpu.ops.sift import detect_and_compute_batch
from sfm_danpipeline_tpu.pipeline.sfm import _pair_list

full = load_images("/root/reference/data/temple")
V = 4
images = dataclasses.replace(
    full, gray=full.gray[:V], color=full.color[:V], sizes=full.sizes[:V],
    paths=full.paths[:V],
)
calib = load_calibration(
    "/root/reference/data/temple/camera_calibration_template.xml"
)
# Drive the sharded_min_obs routing LOW so the observation-sharded polish
# path actually executes on this 4-view problem (at the production default
# of 50k obs the driver takes the replicated early-return — covered by
# test_single_process_polish_routing below).
cfg = PipelineConfig()
cfg = dataclasses.replace(
    cfg, ba=dataclasses.replace(cfg.ba, sharded_min_obs=16)
)

# (a) sharded input pipeline == local single-process computation, exactly.
kp = D.compute_features_multihost(images, cfg)
kp_ref = detect_and_compute_batch(jnp.asarray(images.gray), cfg.features)
for name in ("xy", "descriptors", "valid"):
    np.testing.assert_array_equal(
        np.asarray(getattr(kp, name)), np.asarray(getattr(kp_ref, name)),
        err_msg=f"keypoints.{name} mismatch",
    )
m = D.compute_matches_multihost(kp, V, cfg)
pi, pj = _pair_list(V)
loose = max(cfg.matching.ratio, cfg.matching.registration_ratio)
m_ref = match_all_pairs(
    kp_ref.descriptors, kp_ref.valid, jnp.asarray(pi), jnp.asarray(pj),
    ratio=loose, max_matches=cfg.matching.max_matches,
    strict_ratio=cfg.matching.ratio, xy=kp_ref.xy,
    dup_radius=cfg.matching.dup_radius, dedup=cfg.matching.dedup_matches,
)
for name in ("idx_a", "idx_b", "valid"):
    np.testing.assert_array_equal(
        np.asarray(getattr(m, name)), np.asarray(getattr(m_ref, name)),
        err_msg=f"matches.{name} mismatch",
    )

# (b)+(c) the full driver: every view registers; the polish ran.
res = D.run_sfm_multihost(
    images, calib, cfg, run_ba_every_view=False, polish_iterations=6
)
assert sorted(res.registered_views) == list(range(V)), res.registered_views
assert "mh_polish_cost1" in res.metrics
assert res.metrics["mh_polish_cost1"] <= res.metrics["mh_polish_cost0"] + 1e-6
assert res.metrics["n_processes"] == float(nproc)
# Cross-process consistency: print a digest the parent compares.
cams = np.asarray(res.state.cameras)
pts = np.asarray(res.points)
print(f"DIGEST cams={np.sum(cams):.6f} pts={pts.shape[0]} "
      f"ptsum={np.sum(pts):.4f}", flush=True)
print(f"proc {pid}: OK", flush=True)
"""


@pytest.mark.slow
def test_single_process_polish_routing():
    """At the production sharded_min_obs (50k) a temple-size problem takes
    the replicated early-return: the driver must record the routing
    decision (mh_polish_skipped) instead of silently omitting the polish
    metrics — the r4 regression left this path unobservable and the
    2-process test red."""
    import dataclasses

    from sfm_danpipeline_tpu.config import PipelineConfig
    from sfm_danpipeline_tpu.io.calibration import load_calibration
    from sfm_danpipeline_tpu.io.images import load_images
    from sfm_danpipeline_tpu.parallel import distributed as D

    full = load_images("/root/reference/data/temple")
    V = 4
    images = dataclasses.replace(
        full, gray=full.gray[:V], color=full.color[:V],
        sizes=full.sizes[:V], paths=full.paths[:V],
    )
    calib = load_calibration(
        "/root/reference/data/temple/camera_calibration_template.xml"
    )
    cfg = PipelineConfig()
    assert cfg.ba.sharded_min_obs >= 10000  # production routing intact
    res = D.run_sfm_multihost(
        images, calib, cfg, run_ba_every_view=False, polish_iterations=6
    )
    assert sorted(res.registered_views) == list(range(V))
    assert res.metrics.get("mh_polish_skipped") == 1.0
    assert "mh_polish_cost1" not in res.metrics
    assert res.metrics["mh_n_obs"] < cfg.ba.sharded_min_obs


@pytest.mark.slow
def test_two_process_sfm_driver():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    # Must be set BEFORE interpreter start (sitecustomize registers the
    # axon TPU backend at startup, breaking CPU rendezvous).
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), "2", str(port), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode())
    digests = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert "OK" in out
        digests.append(
            [ln for ln in out.splitlines() if ln.startswith("DIGEST")][0]
        )
    assert digests[0] == digests[1], f"reconstructions diverged: {digests}"
