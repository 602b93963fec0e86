"""Multi-device bundle adjustment: observation-sharded LM over a mesh.

The framework's distributed centerpiece (BASELINE.json north star): the
observation table is block-partitioned over the mesh's data axis, every
device assembles Jacobian/Hessian blocks for its shard, the blocks are
psum-reduced over ICI (XLA collectives inserted by shard_map), and the
small reduced camera system is solved replicated. The reference has no
distributed anything (SURVEY.md §2 parallelism inventory) — this is new
capability with the reference's Ceres solve (src/BundleAdjustment.cpp)
defining only the per-step semantics.

Key invariant (tested on a simulated 8-device CPU mesh): the sharded solve
matches the single-device solve to f32 reduction-order tolerance.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sfm_danpipeline_tpu.config import BAConfig
from sfm_danpipeline_tpu.ba.problem import BAProblem
from sfm_danpipeline_tpu.ba.solver import BAResult, run_ba


def default_mesh(axis: str = "d") -> Mesh:
    """1-D mesh over all LOCAL devices.

    Local, not global: this mesh backs the sharded paths INSIDE the
    single-process pipeline (SfMPipeline). In a multi-process job only
    process 0 runs that pipeline (single-writer + broadcast,
    parallel/distributed.run_sfm_multihost), so a global mesh here would
    issue collectives the other processes never join — measured r5 as a
    gloo deadlock in the 2-process driver test. Cross-process sharding
    belongs to run_ba_multihost, which every process enters together."""
    return Mesh(np.asarray(jax.local_devices()), (axis,))


def pad_observations(problem: BAProblem, multiple: int) -> BAProblem:
    """Pad the observation axis to a device-count multiple with weight-0
    slots (BA provably ignores them, tests/test_ba.py)."""
    O = problem.n_obs
    pad = (-O) % multiple
    if pad == 0:
        return problem
    import dataclasses

    return dataclasses.replace(
        problem,
        obs_cam=jnp.pad(problem.obs_cam, (0, pad)),
        obs_pt=jnp.pad(problem.obs_pt, (0, pad)),
        obs_xy=jnp.pad(problem.obs_xy, ((0, pad), (0, 0))),
        obs_w=jnp.pad(problem.obs_w, (0, pad)),
    )


def run_ba_sharded(
    problem: BAProblem,
    config: BAConfig = BAConfig(),
    mesh: Optional[Mesh] = None,
    axis: str = "d",
) -> BAResult:
    """Observation-sharded LM bundle adjustment.

    Parameters are replicated; obs_* arrays are sharded along `axis`. The
    full LM while_loop runs inside one shard_map, so each iteration costs
    exactly one psum round-trip of the (small) reduced blocks plus the
    replicated dense solve.
    """
    if mesh is None:
        mesh = default_mesh(axis)
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    problem = pad_observations(problem, n_dev)

    obs_spec = P(axis)
    rep = P()
    in_specs = BAProblem(
        cameras=rep,
        focal=rep,
        points=rep,
        obs_cam=obs_spec,
        obs_pt=obs_spec,
        obs_xy=obs_spec,
        obs_w=obs_spec,
        fix_cam=rep,
        fix_focal=rep,
        fix_pt=None if problem.fix_pt is None else rep,
    )
    out_specs = BAResult(
        cameras=rep,
        focal=rep,
        points=rep,
        initial_cost=rep,
        final_cost=rep,
        iterations=rep,
        converged=rep,
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(in_specs,),
        out_specs=out_specs,
    )
    def solve(local: BAProblem) -> BAResult:
        return run_ba(local, config, axis_name=axis)

    return solve(problem)
