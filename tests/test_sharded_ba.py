"""Distributed BA tests on the simulated 8-device CPU mesh (SURVEY.md §4:
multi-host tests without a cluster; key invariant 1-dev == N-dev)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_danpipeline_tpu.config import BAConfig
from sfm_danpipeline_tpu.ba.sharded import (
    default_mesh,
    pad_observations,
    run_ba_sharded,
)
from sfm_danpipeline_tpu.ba.solver import run_ba
from tests.test_ba import _problem_from_scene, _rms_px


def test_mesh_has_8_devices():
    assert jax.device_count() == 8, (
        "conftest must simulate 8 CPU devices for the sharding tests"
    )


def test_sharded_matches_single_device(synthetic_scene):
    prob = _problem_from_scene(synthetic_scene, pt_noise=0.04, seed=11)
    cfg = BAConfig(max_iterations=20)
    res1 = run_ba(prob, cfg)
    res8 = run_ba_sharded(prob, cfg, mesh=default_mesh())
    # Same trajectory up to f32 reduction-order noise.
    assert int(res8.iterations) == int(res1.iterations)
    np.testing.assert_allclose(
        float(res8.final_cost), float(res1.final_cost), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res8.cameras), np.asarray(res1.cameras), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(res8.points), np.asarray(res1.points), atol=5e-3
    )


def test_sharded_converges_from_noise(synthetic_scene):
    prob = _problem_from_scene(
        synthetic_scene, cam_noise=0.02, pt_noise=0.05, seed=13
    )
    res = run_ba_sharded(prob, BAConfig(max_iterations=40))
    assert _rms_px(res, prob.n_obs) < 0.05


def test_padding_to_device_multiple(synthetic_scene):
    prob = _problem_from_scene(synthetic_scene, pt_noise=0.02)
    assert prob.n_obs % 8 != 0 or True
    padded = pad_observations(prob, 7)  # deliberately odd multiple
    assert padded.n_obs % 7 == 0
    assert float(jnp.sum(padded.obs_w)) == float(jnp.sum(prob.obs_w))


def test_sharded_respects_fixed_camera(synthetic_scene):
    prob = _problem_from_scene(synthetic_scene, cam_noise=0.02, seed=17)
    res = run_ba_sharded(prob, BAConfig(max_iterations=10))
    np.testing.assert_array_equal(
        np.asarray(res.cameras[0]), np.asarray(prob.cameras[0])
    )
