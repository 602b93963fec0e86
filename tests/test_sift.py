"""Feature detector tests: synthetic invariances + temple golden gates."""
import numpy as np
import jax.numpy as jnp
import pytest

from sfm_danpipeline_tpu.config import FeatureConfig
from sfm_danpipeline_tpu.ops.sift import detect_and_compute


SMALL_CFG = FeatureConfig(max_keypoints=512, n_octaves=3)


def _blob_image(rng, h=160, w=200, n=25):
    img = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n):
        y, x = rng.integers(25, h - 25), rng.integers(25, w - 25)
        r = rng.uniform(1.5, 5.0)
        img += rng.uniform(0.3, 1.0) * np.exp(
            -((yy - y) ** 2 + (xx - x) ** 2) / (2 * r * r)
        )
    return np.clip(img, 0, 1)


def test_detect_shapes_and_masks():
    img = _blob_image(np.random.default_rng(0))
    kp = detect_and_compute(jnp.asarray(img), SMALL_CFG)
    assert kp.xy.shape == (512, 2)
    assert kp.descriptors.shape == (512, 128)
    n_valid = int(kp.valid.sum())
    assert 10 < n_valid <= 512
    v = np.asarray(kp.valid)
    # Valid keypoints lie inside the image.
    xy = np.asarray(kp.xy)[v]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 200).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 160).all()
    # Descriptors are L2-normalized (after clipping).
    norms = np.linalg.norm(np.asarray(kp.descriptors)[v], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_blob_centers_detected():
    """Keypoints land on the synthetic blob centers (localization check)."""
    img = np.zeros((120, 160), np.float32)
    yy, xx = np.mgrid[0:120, 0:160]
    centers = [(40, 40), (40, 120), (80, 80)]
    for (cy, cx) in centers:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0**2))
    kp = detect_and_compute(jnp.asarray(img), SMALL_CFG)
    v = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)[v]
    for (cy, cx) in centers:
        d = np.linalg.norm(xy - [cx, cy], axis=1).min()
        assert d < 1.0, f"blob at ({cx},{cy}) missed by {d:.2f}px"


def test_translation_equivariance():
    """Shifting the image shifts the keypoints (subpixel localization)."""
    rng = np.random.default_rng(3)
    img = _blob_image(rng)
    shift = 8
    img2 = np.roll(img, shift, axis=1)
    kp1 = detect_and_compute(jnp.asarray(img), SMALL_CFG)
    kp2 = detect_and_compute(jnp.asarray(img2), SMALL_CFG)
    v1, v2 = np.asarray(kp1.valid), np.asarray(kp2.valid)
    xy1 = np.asarray(kp1.xy)[v1]
    xy2 = np.asarray(kp2.xy)[v2]
    # Majority of keypoints should have a +shift-translated partner.
    matched = 0
    for p in xy1:
        if p[0] + shift < 190:  # ignore wrap region
            d = np.linalg.norm(xy2 - (p + [shift, 0]), axis=1).min()
            matched += d < 0.75
    assert matched > 0.6 * len(xy1)


def test_descriptor_matches_under_translation():
    """Descriptors of translated keypoints are near-identical."""
    rng = np.random.default_rng(5)
    img = _blob_image(rng)
    img2 = np.roll(img, 6, axis=0)
    kp1 = detect_and_compute(jnp.asarray(img), SMALL_CFG)
    kp2 = detect_and_compute(jnp.asarray(img2), SMALL_CFG)
    v1 = np.asarray(kp1.valid)
    v2 = np.asarray(kp2.valid)
    d1 = np.asarray(kp1.descriptors)[v1]
    d2 = np.asarray(kp2.descriptors)[v2]
    xy1 = np.asarray(kp1.xy)[v1]
    xy2 = np.asarray(kp2.xy)[v2]
    good = 0
    total = 0
    for i, p in enumerate(xy1):
        # Secondary-orientation keypoints duplicate positions (OpenCV
        # semantics): compare against the best descriptor among ALL
        # co-located candidates, not just the positionally nearest row.
        d = np.linalg.norm(xy2 - (p + [0, 6]), axis=1)
        near = d < 1.0
        if near.any():
            total += 1
            good += (d2[near] @ d1[i]).max() > 0.9
    assert total > 5
    assert good > 0.8 * total


@pytest.mark.slow
def test_temple_keypoint_golden(temple_images):
    """Golden gate on the real dataset: enough keypoints for the >=120
    matches/pair requirement downstream (src/Sfm.cpp:533)."""
    kp = detect_and_compute(jnp.asarray(temple_images.gray[0]))
    assert int(kp.valid.sum()) > 500
