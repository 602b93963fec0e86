"""Multi-host scaffolding: process initialization, host-sharded input, and
the multi-host form of the observation-sharded bundle adjuster.

The reference is a single-process CPU program (SURVEY.md §2 parallelism
inventory: no MPI/NCCL anywhere); multi-host scale is new capability. The
recipe (SURVEY.md §5 "distributed communication backend"):

  1. every process calls `initialize()` (jax.distributed — coordinator
     rendezvous, one process per host),
  2. each host loads ITS image shard (`host_shard`) and computes features /
     matches / normal-equation blocks for its slice,
  3. global arrays are assembled from host-local shards
     (`host_local_to_global`) and collectives ride the global mesh — psum
     over ICI within a slice, DCN across hosts, all inserted by XLA.

Verified by a real 2-process CPU integration test
(tests/test_multihost.py), not just the simulated single-process mesh.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sfm_danpipeline_tpu.config import BAConfig
from sfm_danpipeline_tpu.ba.problem import BAProblem, make_problem
from sfm_danpipeline_tpu.ba.solver import BAResult, run_ba


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host job (jax.distributed.initialize wrapper).

    With no arguments, jax auto-detects cluster environment variables
    (JAX_COORDINATOR_ADDRESS / Slurm / GKE metadata). Must run before any
    other JAX call in the process.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "d") -> Mesh:
    """1-D mesh over ALL devices of ALL processes."""
    return jax.make_mesh((len(jax.devices()),), (axis,))


def host_shard(n_items: int) -> Tuple[int, int]:
    """[start, end) slice of a length-n work list owned by this process —
    the multi-host input pipeline rule (each host loads its own images /
    matches its own pair block; intrinsics broadcast)."""
    p, n = jax.process_index(), jax.process_count()
    per = -(-n_items // n)
    return min(p * per, n_items), min((p + 1) * per, n_items)


def host_local_to_global(x, mesh: Mesh, spec: P):
    """Assemble a global array from this host's local shard."""
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(x, mesh, spec)


def run_ba_multihost(
    local_problem: BAProblem,
    config: BAConfig = BAConfig(),
    mesh: Optional[Mesh] = None,
    axis: str = "d",
) -> BAResult:
    """Observation-sharded LM across processes.

    `local_problem` holds THIS HOST's observation shard (obs_* arrays; the
    local length must be identical on every process — pad with weight-0
    rows) and replicated parameters (cameras/points/focal identical on all
    hosts). Per-shard normal blocks are psum-reduced over the global mesh
    axis; the reduced camera solve is replicated. Returns the replicated
    result as host-local arrays.
    """
    if mesh is None:
        mesh = global_mesh(axis)

    obs, rep = P(axis), P()
    spec = BAProblem(
        cameras=rep, focal=rep, points=rep,
        obs_cam=obs, obs_pt=obs, obs_xy=obs, obs_w=obs,
        fix_cam=rep, fix_focal=rep,
        fix_pt=None if local_problem.fix_pt is None else rep,
    )
    gproblem = jax.tree_util.tree_map(
        lambda x, s: host_local_to_global(np.asarray(x), mesh, s),
        local_problem, spec,
    )
    out_specs = BAResult(
        cameras=rep, focal=rep, points=rep, initial_cost=rep,
        final_cost=rep, iterations=rep, converged=rep,
    )

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec,), out_specs=out_specs
    )
    def solve(local: BAProblem) -> BAResult:
        return run_ba(local, config, axis_name=axis)

    res = solve(gproblem)
    # Replicated outputs -> host-local numpy (first addressable shard).
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a.addressable_data(0)), res
    )


# ---------------------------------------------------------------------------
# End-to-end multi-host SfM driver
# ---------------------------------------------------------------------------


def _gather_tiled(tree, n_keep: int):
    """process_allgather(tiled) each leaf along axis 0 and strip padding
    rows beyond `n_keep` (shards are equal-size, clip-padded)."""
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            multihost_utils.process_allgather(np.asarray(x), tiled=True)
        )[:n_keep],
        tree,
    )


def _detect_local(gray, cfg):
    """The pipeline's detector switch (pipeline/sfm.py stage 1 — reference
    include/Sfm.h:40-61) applied to this host's image shard."""
    if cfg.detector == "orb":
        from sfm_danpipeline_tpu.ops.orb import detect_and_compute_orb_batch

        return detect_and_compute_orb_batch(
            gray, max_keypoints=cfg.max_keypoints
        )
    if cfg.detector == "akaze":
        from sfm_danpipeline_tpu.ops.akaze import (
            detect_and_compute_akaze_batch,
        )

        return detect_and_compute_akaze_batch(gray, cfg)
    from sfm_danpipeline_tpu.ops.sift import detect_and_compute_batch

    return detect_and_compute_batch(gray, cfg)


def compute_features_multihost(images, config):
    """Host-sharded feature extraction: each process detects on ITS
    contiguous image shard (clip-padded to equal size), then the full
    Keypoints batch is assembled by process_allgather — the SURVEY §5
    multi-host input-pipeline rule (each host loads/computes its slice;
    results replicated). Returns the full (V, K, ...) Keypoints, identical
    on every process."""
    V = images.n_images
    nproc = jax.process_count()
    per = -(-V // nproc)
    s = jax.process_index() * per
    idx = np.clip(np.arange(s, s + per), 0, V - 1)
    kp_local = _detect_local(jnp.asarray(images.gray[idx]), config.features)
    # host h's k-th row is image min(h*per+k, V-1), so the first V rows of
    # the tiled gather are exactly images 0..V-1 in order.
    return _gather_tiled(kp_local, V)


def compute_matches_multihost(kp, n_images: int, config):
    """Pair-block-sharded matching across processes: the C(V,2) pair list
    splits into contiguous equal blocks (clip-padded); each host matches
    its block with the pipeline's exact parameters; the full PairMatches
    assembles by process_allgather."""
    from sfm_danpipeline_tpu.ops.matching import match_all_pairs
    from sfm_danpipeline_tpu.pipeline.sfm import _pair_list

    cfg = config.matching
    pi, pj = _pair_list(n_images)
    P = len(pi)
    nproc = jax.process_count()
    per = -(-P // nproc)
    s = jax.process_index() * per
    idx = np.clip(np.arange(s, s + per), 0, P - 1)
    loose = max(cfg.ratio, cfg.registration_ratio)
    m_local = match_all_pairs(
        kp.descriptors,
        kp.valid,
        jnp.asarray(pi[idx]),
        jnp.asarray(pj[idx]),
        ratio=loose,
        max_matches=cfg.max_matches,
        use_pallas=jax.default_backend() == "tpu",
        strict_ratio=cfg.ratio,
        xy=kp.xy,
        dup_radius=cfg.dup_radius,
        dedup=cfg.dedup_matches,
    )
    return _gather_tiled(m_local, P)


def run_sfm_multihost(
    images,
    intrinsics,
    config=None,
    run_ba_every_view: bool = True,
    polish_iterations: int = 12,
    checkpoint_path=None,
):
    """One-entry multi-host SfM: host-sharded features -> pair-block-sharded
    matching -> replicated incremental loop (deterministic, so every process
    holds the identical reconstruction) -> observation-sharded multi-host
    global BA polish over the final map.

    This is the production form of SURVEY §5's distributed story: the heavy
    O(V) feature and O(V^2) matching stages split across hosts; the cheap
    sequential control loop is replicated instead of synchronized; the final
    global LM reduces per-host normal-equation blocks with psum. Call
    `initialize()` first on every process. Single-process calls degrade to
    the plain pipeline plus an extra global polish.

    `checkpoint_path`: per-view checkpointing, written by process 0 only
    (the replicated loop is deterministic, so process 0's state is
    everyone's state). Resume requires the file to be visible to all
    processes (shared filesystem) — with per-host local paths the resumed
    prefix still equals what a fresh run computes, by determinism."""
    from sfm_danpipeline_tpu.config import PipelineConfig
    from sfm_danpipeline_tpu.pipeline.sfm import SfMPipeline

    if config is None:
        config = PipelineConfig()

    import dataclasses

    kp = compute_features_multihost(images, config)
    # Canonicalize keypoint xy to ideal pinhole pixels BEFORE matching when
    # the lens model is nonzero, matching the single-host order
    # (pipeline/sfm.py stage 1.5): the dup_radius co-location logic inside
    # matching must see the same coordinates on both paths (ADVICE r3).
    raw_xy = None
    if bool(np.any(np.asarray(intrinsics.dist) != 0.0)):
        from sfm_danpipeline_tpu.ops.projection import undistort_points
        import dataclasses as _dc

        K = jnp.asarray(intrinsics.K, jnp.float32)
        raw_xy = np.asarray(kp.xy)
        xn = undistort_points(kp.xy, K, jnp.asarray(intrinsics.dist, jnp.float32))
        ideal = jnp.stack(
            [xn[..., 0] * K[0, 0] + K[0, 2], xn[..., 1] * K[1, 1] + K[1, 2]],
            axis=-1,
        )
        kp = _dc.replace(kp, xy=ideal)
    matches = compute_matches_multihost(kp, images.n_images, config)
    pipe = SfMPipeline(
        config,
        checkpoint_path=checkpoint_path if jax.process_index() == 0 else None,
    )
    nproc = jax.process_count()
    if nproc > 1:
        # SINGLE-WRITER incremental loop + broadcast (r5): the sequential
        # control loop is deterministic, so replicating it on every
        # process buys nothing and COSTS two ways — N-fold wasted compute,
        # and on shared boxes memory-bandwidth contention that measured
        # as the Amdahl fraction capping e2e efficiency at 64-66%
        # (tools/bench_multihost.py, r4/r5). Process 0 runs the loop
        # alone (others block cheaply in the collective), then the state
        # broadcasts once — bitwise identical everywhere, unlike
        # replicated execution only by construction.
        from jax.experimental import multihost_utils

        from sfm_danpipeline_tpu.pipeline.sfm import SfMResult
        from sfm_danpipeline_tpu.pipeline.tracks import init_state

        _BCAST_METRICS = (
            "ba_rms_px", "ba_n_obs", "ba_iterations", "n_points",
            "n_registered", "n_components", "n_merged_components",
            "merge_cross_med_px", "n_cross_tracks", "n_keypoints_mean",
            "focal",
        )
        if jax.process_index() == 0:
            result = pipe.run(
                images,
                intrinsics,
                run_ba_every_view=run_ba_every_view,
                precomputed_keypoints=kp,
                precomputed_matches=matches,
                precomputed_canonical=True,
                precomputed_raw_xy=raw_xy,
            )
            state0 = result.state
            reg = np.zeros((images.n_images,), np.int32)
            reg[result.registered_views] = 1
            mvec = np.asarray(
                [float(result.metrics.get(k, np.nan))
                 for k in _BCAST_METRICS],
                np.float32,
            )
        else:
            state0 = init_state(
                images.n_images, config.features.max_keypoints,
                config.max_points, float(intrinsics.fx),
            )
            reg = np.zeros((images.n_images,), np.int32)
            mvec = np.zeros((len(_BCAST_METRICS),), np.float32)
        # Broadcast = pack the whole pytree into ONE flat byte buffer,
        # ONE tiled allgather (a single compiled collective — per-leaf
        # broadcasts compiled a program per shape and serialized ~10
        # gloo rounds), take process 0's block, unpack.
        tree0 = (state0, reg, mvec)
        leaves0 = jax.tree_util.tree_leaves(tree0)
        treedef = jax.tree_util.tree_structure(tree0)
        np_leaves = [np.asarray(x) for x in leaves0]
        buf = np.frombuffer(
            b"".join(x.tobytes() for x in np_leaves), np.uint8
        )
        got = np.asarray(
            multihost_utils.process_allgather(buf[None], tiled=True)
        )[0]
        out_leaves = []
        off = 0
        for ref in np_leaves:
            nb = ref.nbytes
            out_leaves.append(
                np.frombuffer(got[off: off + nb].tobytes(), ref.dtype)
                .reshape(ref.shape)
            )
            off += nb
        state, reg, mvec = jax.tree_util.tree_unflatten(
            treedef, out_leaves
        )
        state = jax.tree_util.tree_map(jnp.asarray, state)
        reg = np.asarray(reg)
        mvec = np.asarray(mvec)
        if jax.process_index() == 0:
            result = dataclasses.replace(result, state=state)
        else:
            valid = np.asarray(state.points_valid)
            result = SfMResult(
                state=state,
                keypoints=kp,
                points=np.asarray(state.points_xyz)[valid],
                colors=np.asarray(state.points_rgb)[valid],
                registered_views=[int(v) for v in np.where(reg)[0]],
                metrics={
                    k: float(v) for k, v in zip(_BCAST_METRICS, mvec)
                    if not np.isnan(v)
                },
                raw_xy=raw_xy,
            )
    else:
        result = pipe.run(
            images,
            intrinsics,
            run_ba_every_view=run_ba_every_view,
            precomputed_keypoints=kp,
            precomputed_matches=matches,
            precomputed_canonical=True,
            precomputed_raw_xy=raw_xy,
        )
    if not result.registered_views:
        return result

    # Multi-host global polish: shard the compact observation rows.
    from sfm_danpipeline_tpu.pipeline.tracks import (
        observation_table_compact,
    )

    state = result.state
    pp = jnp.asarray(
        [intrinsics.cx, intrinsics.cy], jnp.float32
    )
    n_pts = int(jnp.sum(state.points_valid))
    n_obs = int(
        jnp.sum(
            (state.track_feat >= 0)
            & state.points_valid[:, None]
            & state.camera_valid[None, :]
        )
    )
    if n_pts == 0 or n_obs < 16:
        return result
    if n_obs < config.ba.sharded_min_obs:
        # The pipeline's own final BA already solved this replicated; an
        # observation-sharded re-polish pays a psum per LM iteration,
        # which over gloo/DCN costs more than the solve at this size
        # (config.ba.sharded_min_obs rationale). Record the routing
        # decision so callers/tests can assert which path ran.
        return dataclasses.replace(
            result,
            metrics={
                **result.metrics,
                "mh_polish_skipped": 1.0,
                "mh_n_obs": float(n_obs),
                "n_processes": float(jax.process_count()),
            },
        )
    P = state.track_feat.shape[0]
    obs_cam, obs_pt, obs_xy, obs_w, overflow = observation_table_compact(
        state, result.keypoints.xy, pp, n_obs_bucket=n_obs, n_point_bucket=P
    )
    nproc = jax.process_count()
    per = -(-n_obs // nproc)
    s = jax.process_index() * per
    idx = np.arange(s, s + per)
    pad = idx >= n_obs
    idx = np.clip(idx, 0, n_obs - 1)
    fix_cam = np.array(~np.asarray(state.camera_valid))
    fix_cam[result.registered_views[0]] = True  # gauge anchor
    local = make_problem(
        cameras=state.cameras,
        focal=state.focal,
        points=state.points_xyz,
        obs_cam=obs_cam[idx],
        obs_pt=obs_pt[idx],
        obs_xy=obs_xy[idx],
        obs_w=jnp.where(jnp.asarray(pad), 0.0, obs_w[idx]),
        fix_cam=jnp.asarray(fix_cam),
        # Match the single-host final BA's focal policy (pipeline/sfm.py
        # final global BA): frozen unless the config opts in (ADVICE r3).
        fix_focal=not config.ba.optimize_focal,
    )
    res = run_ba_multihost(local, BAConfig(max_iterations=polish_iterations))
    valid = np.asarray(state.points_valid)
    state = dataclasses.replace(
        state,
        cameras=jnp.asarray(res.cameras),
        points_xyz=jnp.asarray(res.points),
        focal=jnp.asarray(res.focal),
    )
    result = dataclasses.replace(
        result,
        state=state,
        points=np.asarray(res.points)[valid],
        metrics={
            **result.metrics,
            "mh_polish_cost0": float(res.initial_cost),
            "mh_polish_cost1": float(res.final_cost),
            "n_processes": float(nproc),
        },
    )
    return result
