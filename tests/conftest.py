"""Test configuration.

Tests run on a simulated 8-device CPU mesh (SURVEY.md §4): sharding and
collective code paths execute in CI without TPU hardware, and the key
distributed invariant (1-device == N-device numerics) is checkable anywhere.
Environment must be set before jax is imported.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment's sitecustomize registers the axon TPU backend at
# interpreter start and forces jax_platforms="axon,cpu", which would route
# every test onto the single tunneled TPU chip (serializing processes and
# defeating the 8-device simulation). Force the CPU backend back on.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover - best effort
    pass

import numpy as np
import pytest

TEMPLE_DIR = "/root/reference/data/temple"
TEMPLE_CALIB = os.path.join(TEMPLE_DIR, "camera_calibration_template.xml")


@pytest.fixture(scope="session")
def temple_images():
    from sfm_danpipeline_tpu.io.images import load_images

    return load_images(TEMPLE_DIR)


@pytest.fixture(scope="session")
def temple_intrinsics():
    from sfm_danpipeline_tpu.io.calibration import load_calibration

    return load_calibration(TEMPLE_CALIB)


@pytest.fixture(scope="session")
def synthetic_scene():
    """Synthetic multi-view scene with exact ground truth: random 3D points
    observed by cameras on an arc, known K. The closed-form fixture for
    geometry kernels (SURVEY.md §4 test plan)."""
    rng = np.random.default_rng(42)
    n_points = 200
    points = rng.uniform(-1.0, 1.0, (n_points, 3))
    points[:, 2] += 4.0  # in front of the rig

    K = np.array([[800.0, 0, 320.0], [0, 800.0, 240.0], [0, 0, 1.0]])

    def camera(angle, radius=0.8):
        # Camera on an arc around the z=4 cluster, looking at it.
        c = np.array([radius * np.sin(angle), 0.2 * np.sin(2 * angle), radius * (1 - np.cos(angle))])
        target = np.array([0.0, 0.0, 4.0])
        z = target - c
        z = z / np.linalg.norm(z)
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world->cam rows
        t = -R @ c
        return R, t

    n_views = 6
    Rs, ts, obs = [], [], []
    for v in range(n_views):
        R, t = camera(0.15 * v)
        Rs.append(R)
        ts.append(t)
        cam = points @ R.T + t
        uv = cam[:, :2] / cam[:, 2:3]
        px = uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        obs.append(px)
    return {
        "points": points,
        "K": K,
        "R": np.stack(Rs),
        "t": np.stack(ts),
        "obs": np.stack(obs),  # (V, N, 2) exact projections
    }


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-program memory at module boundaries.

    A full-suite run accumulates every module's XLA:CPU executables in one
    process; at ~100 tests in, a fresh compile inside
    backend_compile_and_load segfaulted deterministically (r4, twice, same
    position, passing in isolation — a cumulative-memory compiler crash,
    not a test bug). Dropping caches between modules bounds the
    accumulation; later modules recompile locally, which is cheap on CPU.
    """
    yield
    import jax

    jax.clear_caches()
