"""ORB detector tests: corners found, rotation-aware matching, temple gate."""
import numpy as np
import jax.numpy as jnp
import pytest

from sfm_danpipeline_tpu.ops.matching import match_pair
from sfm_danpipeline_tpu.ops.orb import detect_and_compute_orb


def _checker_scene(rng, h=160, w=200, n=18):
    """Random bright squares on dark background — corner-rich."""
    img = np.zeros((h, w), np.float32)
    for _ in range(n):
        y, x = rng.integers(25, h - 40), rng.integers(25, w - 40)
        s = rng.integers(8, 18)
        img[y : y + s, x : x + s] = rng.uniform(0.5, 1.0)
    return img


def test_corners_detected_on_squares():
    rng = np.random.default_rng(0)
    img = _checker_scene(rng)
    kp = detect_and_compute_orb(jnp.asarray(img), max_keypoints=512)
    n = int(kp.valid.sum())
    assert n > 20
    assert kp.descriptors.shape == (512, 256)
    d = np.asarray(kp.descriptors)[np.asarray(kp.valid)]
    assert set(np.unique(d)).issubset({0.0, 1.0})


def test_blank_image_no_keypoints():
    img = jnp.zeros((120, 160))
    kp = detect_and_compute_orb(img, max_keypoints=256)
    assert int(kp.valid.sum()) == 0


def test_translation_matching():
    rng = np.random.default_rng(1)
    img = _checker_scene(rng)
    img2 = np.roll(img, (0, 9), axis=(0, 1))
    kp1 = detect_and_compute_orb(jnp.asarray(img), max_keypoints=512)
    kp2 = detect_and_compute_orb(jnp.asarray(img2), max_keypoints=512)
    m = match_pair(
        kp1.descriptors, kp1.valid, kp2.descriptors, kp2.valid, ratio=0.9,
        max_matches=512,
    )
    v = np.asarray(m.valid)
    assert v.sum() > 15
    pa = np.asarray(kp1.xy)[np.asarray(m.idx_a)[v]]
    pb = np.asarray(kp2.xy)[np.asarray(m.idx_b)[v]]
    delta = pb - pa
    good = np.linalg.norm(delta - [9, 0], axis=1) < 2.0
    assert good.mean() > 0.7


def test_temple_orb_matches(temple_images):
    kp0 = detect_and_compute_orb(jnp.asarray(temple_images.gray[0]))
    kp1 = detect_and_compute_orb(jnp.asarray(temple_images.gray[1]))
    assert int(kp0.valid.sum()) > 300
    m = match_pair(
        kp0.descriptors, kp0.valid, kp1.descriptors, kp1.valid, ratio=0.9,
    )
    assert int(m.count) >= 120  # the reference's usable-pair gate
