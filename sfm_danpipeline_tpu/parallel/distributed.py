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
from sfm_danpipeline_tpu.ba.problem import BAProblem
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
