"""Independent-baseline BA tests (VERDICT r3 missing #2 / directive #5).

ba/reference.py is a float64 numpy+scipy solve of the exact reference
camera model (src/BundleAdjustment.cpp:5-44) sharing no code with the JAX
Schur-LM. These tests assert the two solvers agree — the "Ceres-equivalent"
cost-parity criterion BASELINE.json names, previously only self-referential.
"""
import numpy as np

from sfm_danpipeline_tpu.config import BAConfig
from sfm_danpipeline_tpu.ba.reference import (
    solve_reference_problem,
)
from sfm_danpipeline_tpu.ba.solver import run_ba

from test_ba import _problem_from_scene


def _costs(scene_problem, ba_iters=60, **ref_kw):
    ours = run_ba(scene_problem, BAConfig(max_iterations=ba_iters))
    ref = solve_reference_problem(scene_problem, **ref_kw)
    return ours, ref


class TestIndependentAgreement:
    def test_residuals_agree_at_init(self, synthetic_scene):
        """Both implementations must produce the SAME initial cost on the
        same problem — this pins the camera model itself (Rodrigues +
        perspective + shared focal + pp-subtracted obs), independent of
        optimization."""
        prob = _problem_from_scene(
            synthetic_scene, cam_noise=0.02, pt_noise=0.03, seed=11
        )
        ours = run_ba(prob, BAConfig(max_iterations=1))
        ref = solve_reference_problem(prob, max_nfev=1)
        c0, c1 = float(ours.initial_cost), ref.initial_cost
        assert abs(c0 - c1) / max(c1, 1e-12) < 1e-4, (c0, c1)

    def test_cost_parity_noisy_problem(self, synthetic_scene):
        """From a perturbed start with observation noise, our f32 Schur-LM
        must land within 1% of the f64 scipy optimum (the VERDICT r3 #5
        'within ~1% of its cost' criterion)."""
        prob = _problem_from_scene(
            synthetic_scene, cam_noise=0.01, pt_noise=0.03, obs_noise=0.5,
            seed=13,
        )
        ours, ref = _costs(prob)
        ours_cost = float(ours.final_cost)
        assert ref.final_cost > 0
        gap = (ours_cost - ref.final_cost) / ref.final_cost
        # Our cost may be slightly ABOVE the f64 optimum (f32, fewer
        # iterations) but must be within 1%; materially below would mean
        # the two solvers disagree on the model.
        assert -0.01 < gap < 0.01, (ours_cost, ref.final_cost)

    def test_focal_recovery_agreement(self, synthetic_scene):
        """Start the shared focal 5% off: both solvers must pull it back to
        the true value (BundleAdjustment.cpp:79,133-134 semantics), and to
        the SAME value."""
        prob = _problem_from_scene(
            synthetic_scene, focal_scale=1.05, pt_noise=0.01, seed=17
        )
        ours, ref = _costs(prob)
        f_true = float(synthetic_scene["K"][0, 0])
        assert abs(ref.focal - f_true) < 2.0, ref.focal
        assert abs(float(ours.focal) - ref.focal) < 2.0

    def test_structure_agreement(self, synthetic_scene):
        """Refined structure from the two solvers must coincide after the
        (shared-gauge) solve: same anchors, same model => same minimum."""
        prob = _problem_from_scene(
            synthetic_scene, cam_noise=0.01, pt_noise=0.02, seed=19
        )
        ours, ref = _costs(prob)
        err = np.max(
            np.linalg.norm(np.asarray(ours.points) - ref.points, axis=-1)
        )
        scale = np.linalg.norm(
            ref.points.max(axis=0) - ref.points.min(axis=0)
        )
        assert err < 5e-3 * scale, (err, scale)
