"""All-pairs descriptor matching with Lowe ratio test.

Replaces the reference's BFMatcher L2 kNN (k=2) + ratio-0.8 filter
(`StructFromMotion::getMatching`, src/Sfm.cpp:590-608; ratio constant
NN_MATCH_RATIO=0.8 at include/Sfm.h:60).

TPU-first design: the K_a x K_b distance matrix is a 128-deep matmul — MXU
work. Two implementations with identical semantics:

 - `knn2_jnp`: plain jnp (XLA fuses the matmul + top-2 reduction); the
   reference implementation for tests.
 - `knn2_pallas`: a Pallas kernel that tiles rows of A, keeps the distance
   tile in VMEM, and reduces to (best, second-best) on-chip without ever
   materializing the K_a x K_b matrix in HBM — the speed-of-light path for
   the O(N^2 pairs) matching stage (HOT LOOP #1, src/Sfm.cpp:509-583).

Matches are emitted as fixed-shape arrays (max_matches slots + validity),
the price of jit (SURVEY.md §7).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.4e38  # plain float: jnp scalars would be captured consts in Pallas


@dataclasses.dataclass(frozen=True)
class PairMatches:
    """Fixed-shape match set for one image pair (leading dims under vmap).

    idx_a, idx_b: (M,) int32 — keypoint indices into each image's set
    dist:         (M,) float32 — L2 descriptor distance
    lowe:         (M,) float32 — per-match Lowe ratio d1/d2 (0 when the
                  producer has no second-best notion, e.g. the flow path)
    valid:        (M,) bool
    """

    idx_a: jnp.ndarray
    idx_b: jnp.ndarray
    dist: jnp.ndarray
    lowe: jnp.ndarray
    valid: jnp.ndarray

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def at_ratio(self, ratio: float) -> "PairMatches":
        """Subset that also passes the stricter `ratio` test — lets one
        matching pass at a loose ratio serve several downstream gates."""
        return dataclasses.replace(self, valid=self.valid & (self.lowe <= ratio))


jax.tree_util.register_dataclass(
    PairMatches,
    data_fields=["idx_a", "idx_b", "dist", "lowe", "valid"],
    meta_fields=[],
)


# ---------------------------------------------------------------------------
# Reference jnp implementation
# ---------------------------------------------------------------------------


def knn2_jnp(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    xy_b: jnp.ndarray | None = None,
    dup_r2: float = -1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """For each row of desc_a (Ka, D): (best_idx, best_dist2, second_dist2)
    over valid rows of desc_b (Kb, D).

    When `xy_b` (Kb, 2) is given with `dup_r2` > 0, the second-best search
    excludes candidates co-located with the best (within sqrt(dup_r2) px):
    multi-orientation keypoints duplicate positions (ops/sift.py
    `_describe_octave` emits 2 rows per physical point, matching OpenCV's
    SIFT at src/Sfm.cpp:315-320), and a near-identical twin of the best as
    runner-up drives the Lowe ratio toward 1, suppressing true matches.
    For ratio purposes the runner-up must be a DIFFERENT physical point."""
    # squared L2 via the matmul identity; the matmul is the MXU hot op.
    cross = desc_a @ desc_b.T  # (Ka, Kb)
    na = jnp.sum(desc_a * desc_a, axis=-1, keepdims=True)
    nb = jnp.sum(desc_b * desc_b, axis=-1)
    d2 = jnp.maximum(na + nb[None, :] - 2.0 * cross, 0.0)
    d2 = jnp.where(valid_b[None, :], d2, _INF)
    best_idx = jnp.argmin(d2, axis=-1)
    best = jnp.min(d2, axis=-1)
    cols = jnp.arange(d2.shape[1])[None, :]
    excl = cols == best_idx[:, None]
    if xy_b is not None and dup_r2 > 0:
        best_xy = xy_b[best_idx]  # (Ka, 2)
        delta = xy_b[None, :, :] - best_xy[:, None, :]
        excl = excl | (jnp.sum(delta * delta, axis=-1) <= dup_r2)
    second = jnp.min(jnp.where(excl, _INF, d2), axis=-1)
    return best_idx.astype(jnp.int32), best, second


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _knn2_kernel(a_ref, b_ref, nb_ref, out_idx_ref, out_d_ref, *, dup_r2):
    """One grid step: TILE_A rows of A against all of B.

    a_ref:  (TILE_A, D) VMEM
    b_ref:  (Kb, D)     VMEM (full, replicated across grid steps)
    nb_ref: (3, Kb)     VMEM — row 0: ||b||^2 with invalid rows at +inf;
            rows 1-2: keypoint x, y (for co-location exclusion)
    out_idx_ref: (TILE_A, 1) int32
    out_d_ref:   (TILE_A, 2) float32 — (best, second) squared distances
    """
    a = a_ref[:]
    cross = jax.lax.dot_general(
        a,
        b_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_A, Kb)
    na = jnp.sum(a * a, axis=-1, keepdims=True)
    d2 = jnp.maximum(na + nb_ref[0, :][None, :] - 2.0 * cross, 0.0)
    # nb carries +inf for invalid columns; the max(…, 0) above would clamp
    # inf-awareness, so re-add the mask:
    d2 = jnp.where(nb_ref[0, :][None, :] >= _INF, _INF, d2)
    best = jnp.min(d2, axis=-1)
    best_idx = jnp.argmin(d2, axis=-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    excl = cols == best_idx[:, None]
    if dup_r2 > 0:
        # Exclude co-located twins of the best (secondary-orientation rows
        # share the position) from the second-best search — same semantics
        # as knn2_jnp. Gather-free: select the best column's x/y with a
        # masked reduction (dynamic gathers don't vectorize on TPU).
        xb = nb_ref[1, :][None, :]
        yb = nb_ref[2, :][None, :]
        sel = (cols == best_idx[:, None]).astype(jnp.float32)
        x_best = jnp.sum(sel * xb, axis=-1, keepdims=True)
        y_best = jnp.sum(sel * yb, axis=-1, keepdims=True)
        dx = xb - x_best
        dy = yb - y_best
        excl = excl | (dx * dx + dy * dy <= dup_r2)
    second = jnp.min(jnp.where(excl, _INF, d2), axis=-1)
    out_idx_ref[:] = best_idx[:, None].astype(jnp.int32)
    out_d_ref[:] = jnp.stack([best, second], axis=-1)


@functools.partial(jax.jit, static_argnames=("tile_a", "dup_r2"))
def knn2_pallas(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    xy_b: jnp.ndarray | None = None,
    tile_a: int = 256,
    dup_r2: float = -1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pallas top-2 nearest-neighbor search; semantics identical to
    `knn2_jnp` (asserted in tests/test_matching.py)."""
    Ka, D = desc_a.shape
    Kb = desc_b.shape[0]
    pad = (-Ka) % tile_a
    if pad:
        desc_a = jnp.pad(desc_a, ((0, pad), (0, 0)))
    nb_row = jnp.where(valid_b, jnp.sum(desc_b * desc_b, axis=-1), _INF)
    if xy_b is None:
        xy_b = jnp.zeros((Kb, 2), desc_b.dtype)
        dup_r2 = -1.0
    nb = jnp.stack([nb_row, xy_b[:, 0], xy_b[:, 1]])  # (3, Kb)

    grid = (desc_a.shape[0] // tile_a,)
    # Interpret mode on non-TPU backends (CI runs the simulated CPU mesh).
    interpret = jax.default_backend() != "tpu"
    out_idx, out_d = pl.pallas_call(
        functools.partial(_knn2_kernel, dup_r2=dup_r2),
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_a, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kb, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Kb), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_a, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_a, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((desc_a.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((desc_a.shape[0], 2), jnp.float32),
        ],
    )(desc_a, desc_b, nb)
    return (
        out_idx[:Ka, 0],
        out_d[:Ka, 0],
        out_d[:Ka, 1],
    )


# ---------------------------------------------------------------------------
# Ratio-test matching
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_matches", "use_pallas", "strict_ratio", "dup_radius", "dedup"
    ),
)
def match_pair(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    ratio: float = 0.8,
    max_matches: int = 1024,
    use_pallas: bool = False,
    strict_ratio: float | None = None,
    xy_a: jnp.ndarray | None = None,
    xy_b: jnp.ndarray | None = None,
    dup_radius: float = 0.0,
    dedup: bool = True,
) -> PairMatches:
    """Ratio-test matches from image a to image b (src/Sfm.cpp:599-607).

    A match (i -> j) is kept when d1 <= ratio * d2 with L2 (not squared)
    distances, i is valid, and at least 2 valid candidates exist. The best
    `max_matches` by distance are emitted in fixed-shape slots.

    `strict_ratio` < `ratio` biases the fixed budget: matches passing the
    strict test always rank ahead of loose-only ones, so a saturated pair
    never evicts a strict match (the reference's NN_MATCH_RATIO=0.8 set,
    include/Sfm.h:60) in favor of a loose registration-only match.

    `xy_a`/`xy_b` (K, 2) with `dup_radius` > 0 enable physical-point
    awareness for multi-orientation keypoints (two rows per position,
    ops/sift.py): the ratio's second-best skips co-located twins of the
    best, and among output matches that pair the same two physical points
    (both endpoints within `dup_radius`) only the best-ranked survives —
    one correspondence per physical point pair.
    """
    dup_r2 = float(dup_radius) * float(dup_radius) if dup_radius > 0 else -1.0
    if use_pallas:
        best_idx, best_d2, second_d2 = knn2_pallas(
            desc_a, desc_b, valid_b, xy_b=xy_b, dup_r2=dup_r2
        )
    else:
        best_idx, best_d2, second_d2 = knn2_jnp(
            desc_a, desc_b, valid_b, xy_b=xy_b, dup_r2=dup_r2
        )
    d1 = jnp.sqrt(best_d2)
    d2 = jnp.sqrt(jnp.minimum(second_d2, _INF))
    lowe = d1 / jnp.maximum(d2, 1e-12)
    keep = valid_a & (best_d2 < _INF) & (second_d2 < _INF) & (lowe <= ratio)
    score = jnp.where(keep, -d1, -_INF)
    if strict_ratio is not None:
        # No-op when strict_ratio >= ratio: kept matches have lowe <= ratio.
        score = jnp.where(keep & (lowe > strict_ratio), score - 1e9, score)
    k = min(max_matches, score.shape[0])
    _, order = jax.lax.top_k(score, k)
    if k < max_matches:  # keep the fixed output-shape contract
        order = jnp.pad(order, (0, max_matches - k))
    pad_mask = jnp.arange(max_matches) < k
    valid = keep[order] & pad_mask
    midx_b = best_idx[order]
    if dedup and dup_r2 > 0 and xy_a is not None and xy_b is not None:
        # Physical-point dedup: slots are ranked best-first; drop slot k if
        # an earlier valid slot links the same two physical points.
        axy = xy_a[order]  # (M, 2)
        bxy = xy_b[midx_b]  # (M, 2)
        da = axy[:, None, :] - axy[None, :, :]
        db = bxy[:, None, :] - bxy[None, :, :]
        same_a = jnp.sum(da * da, axis=-1) <= dup_r2
        same_b = (midx_b[:, None] == midx_b[None, :]) | (
            jnp.sum(db * db, axis=-1) <= dup_r2
        )
        M = order.shape[0]
        earlier = jnp.arange(M)[None, :] < jnp.arange(M)[:, None]
        dup = jnp.any(same_a & same_b & earlier & valid[None, :], axis=-1)
        valid = valid & ~dup
    return PairMatches(
        idx_a=order.astype(jnp.int32),
        idx_b=midx_b,
        dist=d1[order],
        lowe=lowe[order],
        valid=valid,
    )


def match_all_pairs(
    descriptors: jnp.ndarray,
    valid: jnp.ndarray,
    pair_i: jnp.ndarray,
    pair_j: jnp.ndarray,
    ratio: float = 0.8,
    max_matches: int = 1024,
    use_pallas: bool = False,
    strict_ratio: float | None = None,
    xy: jnp.ndarray | None = None,
    dup_radius: float = 0.0,
    dedup: bool = True,
) -> PairMatches:
    """Batch-match an explicit list of image pairs.

    descriptors: (N, K, D), valid: (N, K); pair_i/pair_j: (P,) image indices.
    Optional xy: (N, K, 2) keypoint positions enabling multi-orientation
    dedup (see match_pair). Returns PairMatches with leading dim P. This is
    the batched form of the reference's O(N^2) matching loop
    (src/Sfm.cpp:511-533); the pair list is data, so multi-host sharding =
    sharding pair_i/pair_j (SURVEY.md §5).
    """

    def one(i, j):
        return match_pair(
            descriptors[i],
            valid[i],
            descriptors[j],
            valid[j],
            ratio=ratio,
            max_matches=max_matches,
            use_pallas=use_pallas,
            strict_ratio=strict_ratio,
            xy_a=None if xy is None else xy[i],
            xy_b=None if xy is None else xy[j],
            dup_radius=dup_radius,
            dedup=dedup,
        )

    return jax.vmap(one)(pair_i, pair_j)
