"""Descriptor matching tests: jnp semantics, Pallas equivalence, ratio test."""
import numpy as np
import jax.numpy as jnp
import pytest

from sfm_danpipeline_tpu.ops.matching import (
    knn2_jnp,
    knn2_pallas,
    match_all_pairs,
    match_pair,
)


def _random_descs(rng, k, d=128):
    x = rng.normal(size=(k, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_knn2_exact_vs_numpy():
    rng = np.random.default_rng(0)
    a = _random_descs(rng, 64)
    b = _random_descs(rng, 96)
    valid_b = np.ones(96, bool)
    valid_b[90:] = False
    idx, d1, d2 = knn2_jnp(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid_b))
    D = ((a[:, None] - b[None]) ** 2).sum(-1)
    D[:, ~valid_b] = np.inf
    order = np.argsort(D, axis=1)
    # The matmul-identity distance differs from direct subtraction by f32
    # rounding (~1e-4 at ||.||~2), so near-ties may pick either neighbor;
    # assert the *distances* agree instead of exact index equality.
    np.testing.assert_allclose(np.asarray(d1), D[np.arange(64), order[:, 0]], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), D[np.arange(64), order[:, 1]], rtol=1e-3, atol=1e-4)
    chosen = D[np.arange(64), np.asarray(idx)]
    assert np.all(chosen <= D[np.arange(64), order[:, 0]] + 1e-3)


def test_pallas_matches_jnp():
    rng = np.random.default_rng(1)
    a = _random_descs(rng, 300)  # deliberately not a multiple of tile
    b = _random_descs(rng, 256)
    valid_b = np.ones(256, bool)
    valid_b[250:] = False
    ja = jnp.asarray(a)
    jb = jnp.asarray(b)
    jv = jnp.asarray(valid_b)
    i1, d1, s1 = knn2_jnp(ja, jb, jv)
    i2, d2, s2 = knn2_pallas(ja, jb, jv, tile_a=128)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-6)


def test_ratio_test_filters_ambiguous():
    """A descriptor with two equally-near neighbors must be rejected;
    a descriptor with one clear neighbor must be kept (Lowe ratio 0.8,
    reference include/Sfm.h:60)."""
    a = np.zeros((2, 128), np.float32)
    a[0, 0] = 1.0  # clear match to b[0]
    a[1, 1] = 1.0  # ambiguous: b[1] and b[2] identical
    b = np.zeros((3, 128), np.float32)
    b[0, 0] = 1.0
    b[1, 1] = 0.7
    b[2, 1] = 0.7
    b[1, 2] = 0.1
    b[2, 3] = 0.1
    m = match_pair(
        jnp.asarray(a),
        jnp.ones(2, bool),
        jnp.asarray(b),
        jnp.ones(3, bool),
        max_matches=4,
    )
    got = {
        (int(ia), int(ib))
        for ia, ib, v in zip(m.idx_a, m.idx_b, m.valid)
        if bool(v)
    }
    assert (0, 0) in got
    assert all(ia != 1 for ia, _ in got)


def test_match_all_pairs_batched():
    rng = np.random.default_rng(2)
    descs = np.stack([_random_descs(rng, 128) for _ in range(4)])
    # Make image 1 a noisy copy of image 0 -> many matches on that pair.
    descs[1] = descs[0] + 0.01 * rng.normal(size=descs[0].shape).astype(np.float32)
    descs[1] /= np.linalg.norm(descs[1], axis=1, keepdims=True)
    valid = np.ones((4, 128), bool)
    pi = jnp.asarray([0, 0, 0], jnp.int32)
    pj = jnp.asarray([1, 2, 3], jnp.int32)
    m = match_all_pairs(jnp.asarray(descs), jnp.asarray(valid), pi, pj, max_matches=128)
    counts = np.asarray(m.count)
    assert counts.shape == (3,)
    assert counts[0] > 100  # near-duplicate pair matches nearly everything
    assert counts[1] < 40 and counts[2] < 40  # random pairs mostly rejected
    # Matched indices on the near-duplicate pair are the identity.
    v = np.asarray(m.valid[0])
    ia = np.asarray(m.idx_a[0])[v]
    ib = np.asarray(m.idx_b[0])[v]
    assert (ia == ib).mean() > 0.95


def test_temple_adjacent_pair_gate(temple_images):
    """Golden gate: adjacent temple frames produce >= 120 ratio-test matches
    (the reference's usable-pair threshold, src/Sfm.cpp:533)."""
    from sfm_danpipeline_tpu.ops.sift import detect_and_compute

    kp0 = detect_and_compute(jnp.asarray(temple_images.gray[0]))
    kp1 = detect_and_compute(jnp.asarray(temple_images.gray[1]))
    m = match_pair(kp0.descriptors, kp0.valid, kp1.descriptors, kp1.valid)
    assert int(m.count) >= 120


def test_dup_radius_rescues_twin_suppressed_match():
    """A co-located secondary-orientation twin as runner-up must not
    suppress the match: with dup_radius the second-best skips twins of the
    best and the match passes the ratio test."""
    rng = np.random.default_rng(3)
    a = np.zeros((1, 128), np.float32)
    a[0, 0] = 1.0
    b = np.zeros((3, 128), np.float32)
    b[0, 0] = 0.9
    b[0, 1] = 0.1  # best: close to a[0]
    b[1, 0] = 0.88
    b[1, 1] = 0.12  # twin of b[0] (same physical point, other orientation)
    b[2, 5] = 1.0  # distinct far point
    xy_b = jnp.asarray([[10.0, 10.0], [10.0, 10.0], [200.0, 50.0]])
    xy_a = jnp.asarray([[0.0, 0.0]])
    common = dict(ratio=0.8, max_matches=4)
    m_plain = match_pair(
        jnp.asarray(a), jnp.ones(1, bool), jnp.asarray(b), jnp.ones(3, bool),
        **common,
    )
    assert int(m_plain.count) == 0  # twin runner-up drives lowe toward 1
    m_dup = match_pair(
        jnp.asarray(a), jnp.ones(1, bool), jnp.asarray(b), jnp.ones(3, bool),
        xy_a=xy_a, xy_b=xy_b, dup_radius=0.5, **common,
    )
    assert int(m_dup.count) == 1
    v = np.asarray(m_dup.valid)
    assert int(np.asarray(m_dup.idx_b)[v][0]) == 0
    # Pallas path agrees.
    m_pl = match_pair(
        jnp.asarray(a), jnp.ones(1, bool), jnp.asarray(b), jnp.ones(3, bool),
        xy_a=xy_a, xy_b=xy_b, dup_radius=0.5, use_pallas=True, **common,
    )
    assert int(m_pl.count) == 1


def test_dup_radius_dedups_double_correspondence():
    """Two co-located rows in A both matching rows of one physical point in
    B collapse to ONE output correspondence (best-ranked survives)."""
    a = np.zeros((3, 128), np.float32)
    a[0, 0] = 1.0   # orientation row 1 of physical point PA
    a[1, 0] = 0.95  # orientation row 2 of PA
    a[1, 2] = 0.2
    a[2, 7] = 1.0   # distinct point
    b = np.zeros((3, 128), np.float32)
    b[0, 0] = 1.0   # physical point PB
    b[1, 7] = 1.0
    b[2, 3] = 1.0   # far decoy so ratio tests pass
    xy_a = jnp.asarray([[5.0, 5.0], [5.0, 5.0], [100.0, 80.0]])
    xy_b = jnp.asarray([[50.0, 60.0], [120.0, 90.0], [300.0, 10.0]])
    m = match_pair(
        jnp.asarray(a), jnp.ones(3, bool), jnp.asarray(b), jnp.ones(3, bool),
        ratio=0.8, max_matches=8, xy_a=xy_a, xy_b=xy_b, dup_radius=0.5,
    )
    v = np.asarray(m.valid)
    pairs = list(zip(np.asarray(m.idx_a)[v], np.asarray(m.idx_b)[v]))
    # a[0] and a[1] are the same physical point and both match b[0]:
    # only the better one (a[0], dist 0) survives; (2, 1) is unaffected.
    assert (0, 0) in pairs and (2, 1) in pairs
    assert len(pairs) == 2
