"""AKAZE detector tests: shapes/masks, localization, translation
equivariance of MLDB descriptors, and a temple matching golden gate
(reference detector==2 branch, src/Sfm.cpp:331-357)."""
import numpy as np
import jax.numpy as jnp
import pytest

from sfm_danpipeline_tpu.config import FeatureConfig
from sfm_danpipeline_tpu.ops.akaze import detect_and_compute_akaze

SMALL_CFG = FeatureConfig(
    detector="akaze", max_keypoints=256, akaze_n_octaves=3
)


def _blob_image(rng, h=160, w=200, n=25):
    img = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n):
        y, x = rng.integers(25, h - 25), rng.integers(25, w - 25)
        r = rng.uniform(2.0, 5.0)
        img += rng.uniform(0.3, 1.0) * np.exp(
            -((yy - y) ** 2 + (xx - x) ** 2) / (2 * r * r)
        )
    return np.clip(img, 0, 1)


def test_akaze_shapes_and_masks():
    img = _blob_image(np.random.default_rng(0))
    kp = detect_and_compute_akaze(jnp.asarray(img), SMALL_CFG)
    assert kp.xy.shape == (256, 2)
    assert kp.descriptors.shape == (256, 512)
    n_valid = int(kp.valid.sum())
    assert 5 < n_valid <= 256
    v = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)[v]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 200).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 160).all()
    # MLDB bits are exactly {0, 1}; pad region (486:512) all zero.
    d = np.asarray(kp.descriptors)[v]
    assert set(np.unique(d)).issubset({0.0, 1.0})
    assert (d[:, 486:] == 0).all()


def test_akaze_blob_centers_detected():
    img = np.zeros((120, 160), np.float32)
    yy, xx = np.mgrid[0:120, 0:160]
    centers = [(40, 40), (40, 120), (80, 80)]
    for (cy, cx) in centers:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 4.0**2))
    kp = detect_and_compute_akaze(jnp.asarray(img), SMALL_CFG)
    v = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)[v]
    for (cy, cx) in centers:
        d = np.linalg.norm(xy - [cx, cy], axis=1).min()
        assert d < 2.0, f"blob at ({cx},{cy}) missed by {d:.2f}px"


def test_akaze_translation_equivariance():
    rng = np.random.default_rng(3)
    img = _blob_image(rng)
    shift = 8
    img2 = np.roll(img, shift, axis=1)
    kp1 = detect_and_compute_akaze(jnp.asarray(img), SMALL_CFG)
    kp2 = detect_and_compute_akaze(jnp.asarray(img2), SMALL_CFG)
    xy1 = np.asarray(kp1.xy)[np.asarray(kp1.valid)]
    xy2 = np.asarray(kp2.xy)[np.asarray(kp2.valid)]
    matched = 0
    considered = 0
    for p in xy1:
        if p[0] + shift < 190:
            considered += 1
            d = np.linalg.norm(xy2 - (p + [shift, 0]), axis=1).min()
            matched += d < 1.5
    assert considered > 5
    assert matched > 0.6 * considered


def test_akaze_descriptor_hamming_under_translation():
    """MLDB bits of translated keypoints mostly agree (Hamming distance of
    true pairs well below the ~243-bit random-pair expectation)."""
    rng = np.random.default_rng(5)
    img = _blob_image(rng)
    img2 = np.roll(img, 6, axis=0)
    kp1 = detect_and_compute_akaze(jnp.asarray(img), SMALL_CFG)
    kp2 = detect_and_compute_akaze(jnp.asarray(img2), SMALL_CFG)
    d1 = np.asarray(kp1.descriptors)[np.asarray(kp1.valid)]
    d2 = np.asarray(kp2.descriptors)[np.asarray(kp2.valid)]
    xy1 = np.asarray(kp1.xy)[np.asarray(kp1.valid)]
    xy2 = np.asarray(kp2.xy)[np.asarray(kp2.valid)]
    good = total = 0
    for i, p in enumerate(xy1):
        j = np.linalg.norm(xy2 - (p + [0, 6]), axis=1).argmin()
        if np.linalg.norm(xy2[j] - (p + [0, 6])) < 1.5:
            total += 1
            hamming = np.sum(d1[i] != d2[j])
            good += hamming < 80
    assert total > 5
    assert good > 0.7 * total


@pytest.mark.slow
def test_akaze_temple_matching_golden(temple_images):
    """Adjacent temple views must produce a healthy coherent match set with
    MLDB + Hamming ratio matching (binary ratio 0.9, cf. ops/orb.py)."""
    from sfm_danpipeline_tpu.ops.matching import match_pair

    cfg = FeatureConfig(detector="akaze", max_keypoints=512)
    kp0 = detect_and_compute_akaze(jnp.asarray(temple_images.gray[0]), cfg)
    kp1 = detect_and_compute_akaze(jnp.asarray(temple_images.gray[1]), cfg)
    assert int(kp0.valid.sum()) > 200
    m = match_pair(
        kp0.descriptors, kp0.valid, kp1.descriptors, kp1.valid,
        max_matches=512, ratio=0.9,
    )
    n = int(m.valid.sum())
    assert n >= 120  # the reference's usable-pair gate (src/Sfm.cpp:533)
    pa = np.asarray(kp0.xy[m.idx_a[m.valid]])
    pb = np.asarray(kp1.xy[m.idx_b[m.valid]])
    disp = np.linalg.norm(pa - pb, axis=1)
    assert np.median(disp) < 15.0  # neighbouring views: small coherent flow
