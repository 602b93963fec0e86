"""End-to-end pipeline integration test on the bundled temple dataset —
the analogue of the reference's only verification affordance (README.md:43:
run the binary on data/temple)."""
import numpy as np
import pytest

from sfm_danpipeline_tpu.config import PipelineConfig
from sfm_danpipeline_tpu.pipeline.sfm import SfMPipeline


@pytest.mark.slow
def test_temple_incremental_reconstruction(temple_images, temple_intrinsics):
    cfg = PipelineConfig().replace(max_points=8192)
    res = SfMPipeline(cfg).run(temple_images, temple_intrinsics)
    # The temple subset has a genuine viewpoint break between images 5 and 6
    # (the Middlebury capture rig moves to a different arc of its
    # hemisphere): the reference's pipeline loses views 6-9 outright (PnP
    # against the views-0-5 cloud starves, src/Sfm.cpp:955-958 just skips).
    # Here ALL views register — either directly (P3P-backed PnP bridges the
    # break at its ~5-10% bridge-match inlier rate) or via the secondary
    # component + verified Sim(3) merge fallback.
    assert len(res.registered_views) == 10
    assert res.metrics["n_points"] >= 1000
    assert res.metrics["ba_rms_px"] < 1.0
    if res.metrics["n_merged_components"] > 0:
        # Merge quality: the fused cross-component tracks must be numerous
        # and reproject tightly — the invariant a wrong-scale Sim(3)
        # cannot fake (B-only observations are similarity-invariant; see
        # pipeline/merge.py views_reprojection_median).
        assert res.metrics["n_cross_tracks"] >= 20
        assert res.metrics["merge_cross_med_px"] < 4.0
    # Global geometry: every Middlebury temple camera sits on a hemisphere
    # around the object, so all camera centers are near-equidistant from
    # the cloud centroid. A wrong-scale merge puts component B's cameras at
    # a different radius. (NOTE: consecutive camera gaps are NOT uniform —
    # the capture order jumps between arcs at 5->6 — so an equidistant-arc
    # assertion would be wrong; verified visually + by cross-track BA
    # consistency in round 3.)
    from sfm_danpipeline_tpu.utils.metrics import camera_centers

    centroid = res.points.mean(axis=0)
    C = camera_centers(np.asarray(res.state.cameras))[res.registered_views]
    r = np.linalg.norm(C - centroid, axis=1)
    assert r.max() / r.min() < 1.35, f"camera radii {r}"
