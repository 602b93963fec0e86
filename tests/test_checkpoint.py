"""Checkpoint / resume tests (SURVEY.md §5: the reference has none — a
killed run restarts from zero; here the reconstruction state is durable)."""
import json
import os

import numpy as np
import jax.numpy as jnp

from sfm_danpipeline_tpu.pipeline.tracks import ReconstructionState
from sfm_danpipeline_tpu.utils.checkpoint import load_state, save_state


def _toy_state(P=64, V=4, K=32, seed=0) -> ReconstructionState:
    rng = np.random.default_rng(seed)
    n = P // 2
    valid = np.zeros(P, bool)
    valid[:n] = True
    track = np.full((P, V), -1, np.int32)
    track[:n, 0] = np.arange(n) % K
    track[:n, 1] = (np.arange(n) + 3) % K
    inv = np.full((V, K), -1, np.int32)
    for p in range(n):
        inv[0, track[p, 0]] = p
    cams = rng.normal(0, 0.1, (V, 6)).astype(np.float32)
    cam_valid = np.array([True, True, False, False])
    pts = rng.normal(0, 1, (P, 3)).astype(np.float32)
    pts[:, 2] += 4
    return ReconstructionState(
        points_xyz=jnp.asarray(pts),
        points_rgb=jnp.asarray(rng.uniform(0, 1, (P, 3)).astype(np.float32)),
        points_valid=jnp.asarray(valid),
        track_feat=jnp.asarray(track),
        feat_to_point=jnp.asarray(inv),
        cameras=jnp.asarray(cams),
        camera_valid=jnp.asarray(cam_valid),
        focal=jnp.asarray(800.0, jnp.float32),
        n_points=jnp.asarray(n, jnp.int32),
    )


class TestCheckpoint:
    def test_state_roundtrip(self, tmp_path):
        state = _toy_state()
        path = str(tmp_path / "ckpt.npz")
        save_state(path, state, done_views=np.array([0, 1]))
        loaded, extra = load_state(path)
        for f in (
            "points_xyz", "points_rgb", "points_valid", "track_feat",
            "feat_to_point", "cameras", "camera_valid", "focal", "n_points",
        ):
            np.testing.assert_array_equal(
                np.asarray(getattr(loaded, f)), np.asarray(getattr(state, f)),
                err_msg=f,
            )
        np.testing.assert_array_equal(extra["done_views"], [0, 1])

    def test_resume_continues_incremental(self, tmp_path):
        """A reloaded state is a drop-in for the live one: the observation
        table (the BA/PnP input) is identical."""
        from sfm_danpipeline_tpu.pipeline.tracks import observation_table

        state = _toy_state()
        path = str(tmp_path / "ckpt.npz")
        save_state(path, state)
        loaded, _ = load_state(path)
        kp_xy = jnp.asarray(
            np.random.default_rng(1).uniform(0, 100, (4, 32, 2))
        ).astype(jnp.float32)
        pp = jnp.asarray([50.0, 50.0], jnp.float32)
        for a, b in zip(
            observation_table(state, kp_xy, pp),
            observation_table(loaded, kp_xy, pp),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCLIResume:
    def test_analysis_from_checkpoint(self, tmp_path):
        """`--stages dendrometry` with a checkpoint runs the analysis tail
        without redoing SfM (the reference couples stages only through
        MAP3D.pcd on disk, src/Segmentation.cpp:8 — this is the equivalent
        resume affordance)."""
        import pytest

        from sfm_danpipeline_tpu.cli import main

        TEMPLE_DIR = "/root/reference/data/temple"
        TEMPLE_CALIB = os.path.join(
            TEMPLE_DIR, "camera_calibration_template.xml"
        )
        if not os.path.exists(TEMPLE_CALIB):
            pytest.skip("temple dataset not available")
        state = _toy_state(P=256, V=4, K=64)
        ckpt = str(tmp_path / "state.npz")
        save_state(ckpt, state)
        out = str(tmp_path / "out")
        rc = main([
            "--images", TEMPLE_DIR,
            "--calibration", TEMPLE_CALIB,
            "--output", out,
            "--stages", "dendrometry",
            "--checkpoint", ckpt,
        ])
        assert rc == 0
        with open(os.path.join(out, "dendrometry.json")) as f:
            rep = json.load(f)
        assert rep["total_height"] > 0


import pytest


@pytest.mark.slow
def test_mid_run_kill_and_resume(tmp_path, temple_images, temple_intrinsics):
    """A run killed mid-incremental resumes from the per-view checkpoint
    and completes to a gate-passing reconstruction (SURVEY.md §5; VERDICT
    r2 weak #8: the r2 pipeline checkpointed only after the whole stage)."""
    import dataclasses

    from sfm_danpipeline_tpu.config import PipelineConfig
    from sfm_danpipeline_tpu.pipeline.sfm import SfMPipeline

    sub = dataclasses.replace(
        temple_images,
        gray=temple_images.gray[:6],
        color=temple_images.color[:6],
        sizes=temple_images.sizes[:6],
        paths=temple_images.paths[:6],
    )
    cfg = PipelineConfig().replace(max_points=8192)
    ckpt = str(tmp_path / "mid.npz")

    # Simulate a kill: abort the growth loop right after the 3rd view's
    # checkpoint lands.
    class _Killed(RuntimeError):
        pass

    pipe = SfMPipeline(cfg, checkpoint_path=ckpt)
    orig = pipe._save_ckpt
    calls = {"n": 0}

    def killing_save(state, done, lost, anchor):
        orig(state, done, lost, anchor)
        calls["n"] += 1
        if len(done) >= 3:
            raise _Killed()

    pipe._save_ckpt = killing_save
    with pytest.raises(_Killed):
        pipe.run(sub, temple_intrinsics)
    assert os.path.exists(ckpt)

    # Fresh pipeline object resumes from the checkpoint and completes.
    pipe2 = SfMPipeline(cfg, checkpoint_path=ckpt)
    res = pipe2.run(sub, temple_intrinsics)
    assert len(res.registered_views) == 6
    assert res.metrics["ba_rms_px"] < 1.0
    assert res.metrics["n_points"] >= 500
