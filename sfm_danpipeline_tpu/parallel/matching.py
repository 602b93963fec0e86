"""Pair-grid-sharded descriptor matching.

The reference's all-pairs matching loop is its HOT LOOP #1
(src/Sfm.cpp:509-583), O(N^2) in image count and unpartitioned. The scaling
story (SURVEY.md §5 "long-context analogue"): block-partition the C(N,2)
pair list over the mesh's data axis — each device matches its block of
pairs against the replicated descriptor set; results gather back sharded.
No collectives are needed inside the kernel (pair matching is embarrassingly
parallel); shard_map exists to pin the partitioning and keep the descriptor
broadcast on ICI.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sfm_danpipeline_tpu.ops.matching import PairMatches, match_all_pairs


def match_all_pairs_sharded(
    descriptors: jnp.ndarray,
    valid: jnp.ndarray,
    pair_i: jnp.ndarray,
    pair_j: jnp.ndarray,
    ratio: float = 0.8,
    max_matches: int = 1024,
    mesh: Optional[Mesh] = None,
    axis: str = "d",
    use_pallas: bool = False,
    strict_ratio: float | None = None,
    xy: jnp.ndarray | None = None,
    dup_radius: float = 0.0,
    dedup: bool = True,
) -> PairMatches:
    """Sharded form of ops.matching.match_all_pairs.

    descriptors (N, K, D) / valid (N, K) / xy (N, K, 2) are replicated;
    pair_i/pair_j (NP,) shard along `axis`. The returned PairMatches covers
    the original NP pairs (padding pairs are stripped). `use_pallas`/
    `strict_ratio`/`dup_radius` pass through to the per-shard matcher
    (production parity with the single-device path, pipeline/sfm.py).
    """
    if mesh is None:
        # LOCAL devices (cf. ba/sharded.default_mesh): the in-pipeline
        # sharded matcher must not issue global collectives a passive
        # process never joins (single-writer multi-host driver, r5).
        mesh = Mesh(np.asarray(jax.local_devices()), (axis,))
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    NP = pair_i.shape[0]
    pad = (-NP) % n_dev
    if pad:
        pair_i = jnp.pad(pair_i, (0, pad))
        pair_j = jnp.pad(pair_j, (0, pad))
    if xy is None:
        xy = jnp.zeros(descriptors.shape[:2] + (2,), descriptors.dtype)
        dup_radius = 0.0

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P()),
        out_specs=PairMatches(
            idx_a=P(axis), idx_b=P(axis), dist=P(axis), lowe=P(axis),
            valid=P(axis),
        ),
    )
    def matcher(desc, val, pi, pj, kxy):
        return match_all_pairs(
            desc, val, pi, pj, ratio=ratio, max_matches=max_matches,
            use_pallas=use_pallas, strict_ratio=strict_ratio,
            xy=kxy, dup_radius=dup_radius, dedup=dedup,
        )

    out = matcher(descriptors, valid, pair_i, pair_j, xy)
    if pad:
        # Slicing a sharded array to a non-divisible length has no
        # unambiguous sharding; replicate first, then strip padding pairs.
        from jax.sharding import NamedSharding

        rep_sh = NamedSharding(mesh, P())
        out = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, rep_sh)[:NP], out
        )
    return out
