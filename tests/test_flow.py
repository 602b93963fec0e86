"""Optical-flow matcher tests: LK tracking accuracy + pair matching."""
import numpy as np
import jax.numpy as jnp

from sfm_danpipeline_tpu.ops.flow import flow_match_pair, lk_track


def _smooth_texture(h, w, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.normal(size=(h // 4 + 2, w // 4 + 2)).astype(np.float32)
    from scipy import ndimage

    t = ndimage.zoom(t, 4, order=3)[:h, :w]
    return ((t - t.min()) / (np.ptp(t) + 1e-9)).astype(np.float32)


class TestLK:
    def test_tracks_known_shift(self):
        img = _smooth_texture(120, 160, seed=1)
        from scipy import ndimage

        shift = (2.3, -3.6)  # (dy, dx)
        img2 = ndimage.shift(img, shift, order=3, mode="nearest")
        rng = np.random.default_rng(2)
        pts = rng.uniform([20, 20], [140, 100], (50, 2)).astype(np.float32)
        p1, ok = lk_track(
            jnp.asarray(img), jnp.asarray(img2), jnp.asarray(pts),
            jnp.ones(50, bool),
        )
        ok = np.asarray(ok)
        assert ok.mean() > 0.8
        flow = np.asarray(p1)[ok] - pts[ok]
        err = flow - [shift[1], shift[0]]
        assert np.abs(np.median(err, 0)).max() < 0.2

    def test_large_shift_via_pyramid(self):
        img = _smooth_texture(160, 200, seed=3)
        from scipy import ndimage

        img2 = ndimage.shift(img, (0, 14.0), order=3, mode="nearest")
        rng = np.random.default_rng(4)
        pts = rng.uniform([40, 40], [150, 110], (40, 2)).astype(np.float32)
        p1, ok = lk_track(
            jnp.asarray(img), jnp.asarray(img2), jnp.asarray(pts),
            jnp.ones(40, bool), levels=4,
        )
        ok = np.asarray(ok)
        flow = np.asarray(p1)[ok] - pts[ok]
        good = np.abs(flow[:, 0] - 14.0) < 0.5
        assert good.mean() > 0.7


class TestFlowMatch:
    def test_matches_shifted_keypoints(self):
        img = _smooth_texture(120, 160, seed=5)
        from scipy import ndimage

        img2 = ndimage.shift(img, (0, 5.0), order=3, mode="nearest")
        rng = np.random.default_rng(6)
        xy0 = rng.uniform([20, 20], [130, 95], (64, 2)).astype(np.float32)
        xy1 = (xy0 + [5.0, 0.0]).astype(np.float32)  # true correspondents
        m = flow_match_pair(
            jnp.asarray(img), jnp.asarray(img2),
            jnp.asarray(xy0), jnp.ones(64, bool),
            jnp.asarray(xy1), jnp.ones(64, bool),
            radius=2.0, max_matches=64,
        )
        v = np.asarray(m.valid)
        assert v.sum() > 40
        ia = np.asarray(m.idx_a)[v]
        ib = np.asarray(m.idx_b)[v]
        assert (ia == ib).mean() > 0.9  # identity correspondence
