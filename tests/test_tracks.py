"""Track-table unit tests: append, fusion, inverse-map consistency,
masked-scatter safety, and observation pruning."""
import numpy as np
import jax.numpy as jnp

from sfm_danpipeline_tpu.pipeline.tracks import (
    add_points,
    find_2d3d,
    init_state,
    observation_table,
    prune_observations,
)


def _state(capacity=64, n_views=4, k=32):
    return init_state(n_views, k, capacity, focal=100.0)


def _xyz(n, base=0.0):
    return jnp.asarray(
        np.arange(n * 3, dtype=np.float32).reshape(n, 3) + base
    )


class TestAddPoints:
    def test_append_basic(self):
        st = _state()
        st = add_points(
            st,
            _xyz(3),
            jnp.zeros((3, 3)),
            view_a=0,
            feat_a=jnp.asarray([1, 2, 3]),
            view_b=1,
            feat_b=jnp.asarray([4, 5, 6]),
            mask=jnp.asarray([True, True, False]),
        )
        assert int(st.n_points) == 2
        assert bool(st.points_valid[0]) and bool(st.points_valid[1])
        assert not bool(st.points_valid[2])
        tf = np.asarray(st.track_feat)
        assert tf[0, 0] == 1 and tf[0, 1] == 4
        assert tf[1, 0] == 2 and tf[1, 1] == 5
        f2p = np.asarray(st.feat_to_point)
        assert f2p[0, 1] == 0 and f2p[1, 4] == 0
        assert f2p[0, 2] == 1 and f2p[1, 5] == 1
        # masked candidate left no trace
        assert f2p[0, 3] == -1 and f2p[1, 6] == -1

    def test_fusion_extends_track(self):
        st = _state()
        st = add_points(
            st, _xyz(1), jnp.zeros((1, 3)),
            0, jnp.asarray([7]), 1, jnp.asarray([8]), jnp.asarray([True]),
        )
        # New candidate shares (view 1, feat 8) -> must fuse, adding view 2.
        st = add_points(
            st, _xyz(1, base=100.0), jnp.zeros((1, 3)),
            1, jnp.asarray([8]), 2, jnp.asarray([9]), jnp.asarray([True]),
        )
        assert int(st.n_points) == 1  # no new point
        tf = np.asarray(st.track_feat)
        assert tf[0, 0] == 7 and tf[0, 1] == 8 and tf[0, 2] == 9
        assert np.asarray(st.feat_to_point)[2, 9] == 0

    def test_masked_entries_do_not_corrupt(self):
        """A masked candidate sharing a feature id with a valid one must not
        clobber the valid one's inverse-map entry (the last-wins scatter bug
        that broke incremental PnP)."""
        st = _state()
        st = add_points(
            st, _xyz(2), jnp.zeros((2, 3)),
            0, jnp.asarray([5, 5]), 1, jnp.asarray([6, 7]),
            jnp.asarray([True, False]),
        )
        assert int(st.n_points) == 1
        assert np.asarray(st.feat_to_point)[0, 5] == 0

    def test_capacity_overflow_drops(self):
        st = _state(capacity=2)
        st = add_points(
            st, _xyz(4), jnp.zeros((4, 3)),
            0, jnp.asarray([0, 1, 2, 3]), 1, jnp.asarray([4, 5, 6, 7]),
            jnp.ones(4, bool),
        )
        assert int(st.n_points) == 2
        assert np.asarray(st.points_valid).sum() == 2


class TestFind2D3D:
    def test_lookup(self):
        st = _state()
        st = add_points(
            st, _xyz(2), jnp.zeros((2, 3)),
            0, jnp.asarray([1, 2]), 1, jnp.asarray([3, 4]), jnp.ones(2, bool),
        )
        # New view 2 matches feature 10 -> (done view 1, feat 3) => point 0.
        p, f, m = find_2d3d(
            st,
            jnp.asarray(2),
            jnp.asarray(1),
            jnp.asarray([10, 11]),
            jnp.asarray([3, 30]),
            jnp.asarray([True, True]),
        )
        assert bool(m[0]) and int(p[0]) == 0 and int(f[0]) == 10
        assert not bool(m[1])  # feat 30 not in cloud


class TestObservationTable:
    def test_roundtrip(self):
        st = _state()
        st = add_points(
            st, _xyz(2), jnp.zeros((2, 3)),
            0, jnp.asarray([1, 2]), 1, jnp.asarray([3, 4]), jnp.ones(2, bool),
        )
        import dataclasses

        st = dataclasses.replace(
            st, camera_valid=st.camera_valid.at[0].set(True).at[1].set(True)
        )
        kxy = jnp.arange(4 * 32 * 2, dtype=jnp.float32).reshape(4, 32, 2)
        oc, op, oxy, ow = observation_table(st, kxy, jnp.zeros(2))
        w = np.asarray(ow) > 0
        assert w.sum() == 4  # 2 points x 2 views
        # each observation points at the right keypoint coordinate
        oc_, op_ = np.asarray(oc)[w], np.asarray(op)[w]
        oxy_ = np.asarray(oxy)[w]
        tf = np.asarray(st.track_feat)
        for c, p, xy in zip(oc_, op_, oxy_):
            np.testing.assert_allclose(xy, np.asarray(kxy[c, tf[p, c]]))


class TestPrune:
    def test_prunes_bad_observation_and_dead_points(self):
        import dataclasses

        st = _state(n_views=3)
        # Camera 0,1,2 at identity-ish poses; point at (0,0,5).
        st = dataclasses.replace(
            st,
            camera_valid=jnp.asarray([True, True, True]),
            cameras=jnp.zeros((3, 6)),
        )
        K = jnp.asarray([[100.0, 0, 0], [0, 100.0, 0], [0, 0, 1.0]])
        # Keypoints: view0 feat0 projects exactly; view1 feat1 off by 50px;
        # view2 feat2 exact.
        kxy = jnp.zeros((3, 32, 2))
        kxy = kxy.at[1, 1].set(jnp.asarray([50.0, 0.0]))
        st = add_points(
            st, jnp.asarray([[0.0, 0.0, 5.0]]), jnp.zeros((1, 3)),
            0, jnp.asarray([0]), 1, jnp.asarray([1]), jnp.ones(1, bool),
        )
        st = add_points(
            st, jnp.asarray([[0.0, 0.0, 5.0]]), jnp.zeros((1, 3)),
            0, jnp.asarray([0]), 2, jnp.asarray([2]), jnp.ones(1, bool),
        )
        assert int(st.n_points) == 1  # fused
        st2 = prune_observations(st, kxy, K, max_error_px=6.0)
        tf = np.asarray(st2.track_feat)
        assert tf[0, 0] == 0 and tf[0, 2] == 2
        assert tf[0, 1] == -1  # 50px observation dropped
        assert bool(st2.points_valid[0])  # still 2 observations
        # Drop another observation -> point dies.
        kxy = kxy.at[2, 2].set(jnp.asarray([80.0, 0.0]))
        st3 = prune_observations(st, kxy, K, max_error_px=6.0)
        assert not bool(st3.points_valid[0])
