"""Seed-reproducibility sweep (VERDICT r3 directive #2).

The r3 headline (10/10 direct registration) was key/seed-sensitive: the
BASELINE.md number came from a run the driver could not reproduce. This
test asserts the temple reconstruction is complete on EVERY seed — the
reconstruction may bridge the 5->6 hemisphere break either directly (P3P)
or via the gated secondary-component merge, but 10/10 registered with a
sub-pixel RMS must hold unconditionally.

Features and matching are seed-independent (detection is deterministic,
RANSAC keys derive from config.geometry.seed downstream), so they are
computed once and injected per seed via the precomputed_* hooks — the
sweep then costs 5 reconstructions, not 5 full pipelines.
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

SEEDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def temple_front_end():
    from sfm_danpipeline_tpu.config import PipelineConfig
    from sfm_danpipeline_tpu.io.calibration import load_calibration
    from sfm_danpipeline_tpu.io.images import load_images
    from sfm_danpipeline_tpu.ops.sift import detect_and_compute_batch
    from sfm_danpipeline_tpu.ops.matching import match_all_pairs
    from sfm_danpipeline_tpu.pipeline.sfm import _pair_list

    cfg = PipelineConfig()
    images = load_images("/root/reference/data/temple")
    calib = load_calibration(
        "/root/reference/data/temple/camera_calibration_template.xml"
    )
    kp = detect_and_compute_batch(jnp.asarray(images.gray), cfg.features)
    pi, pj = _pair_list(images.n_images)
    loose = max(cfg.matching.ratio, cfg.matching.registration_ratio)
    matches = match_all_pairs(
        kp.descriptors, kp.valid, jnp.asarray(pi), jnp.asarray(pj),
        ratio=loose, max_matches=cfg.matching.max_matches,
        strict_ratio=cfg.matching.ratio, xy=kp.xy,
        dup_radius=cfg.matching.dup_radius, dedup=cfg.matching.dedup_matches,
    )
    return images, calib, cfg, kp, matches


@pytest.mark.parametrize("seed", SEEDS)
def test_temple_complete_on_every_seed(temple_front_end, seed):
    from sfm_danpipeline_tpu.pipeline.sfm import SfMPipeline

    images, calib, cfg, kp, matches = temple_front_end
    cfg = dataclasses.replace(
        cfg, geometry=dataclasses.replace(cfg.geometry, seed=seed)
    )
    res = SfMPipeline(cfg).run(
        images, calib,
        precomputed_keypoints=kp, precomputed_matches=matches,
    )
    m = res.metrics
    assert len(res.registered_views) == images.n_images, (
        f"seed {seed}: {sorted(res.registered_views)}"
    )
    assert m["ba_rms_px"] < 1.0, f"seed {seed}: RMS {m['ba_rms_px']}"
    assert m["n_points"] >= 1000, f"seed {seed}: {m['n_points']} points"
    # Hemisphere-consistency (bench camera_sphere gate).
    from sfm_danpipeline_tpu.utils.metrics import camera_centers

    centers = camera_centers(np.asarray(res.state.cameras))[
        sorted(res.registered_views)
    ]
    r = np.linalg.norm(centers - res.points.mean(axis=0), axis=1)
    assert r.min() > 0 and r.max() / r.min() < 1.35, f"seed {seed}: radii {r}"
