"""Pyramidal Lucas-Kanade optical-flow feature matching.

The reference's alternative matching path (`MatchFeatures`,
src/Sfm.cpp:1399-1474): cv::calcOpticalFlowPyrLK tracks the left image's
keypoints into the right image, then a radius match against the right
image's detected keypoints (FLANN, ratio 0.7) converts flow endpoints into
keypoint-keypoint matches.

TPU formulation: the classic 3-level pyramidal LK — per keypoint, iterate
delta = G^-1 b over a fixed window with bilinear gathers — vmapped over all
keypoints at once; then one distance matrix against the target keypoints
(MXU matmul shape) for the radius association.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.ops.interp import bilinear_sample
from sfm_danpipeline_tpu.ops.matching import PairMatches


def _pyramid(img: jnp.ndarray, levels: int):
    out = [img]
    for _ in range(levels - 1):
        i = out[-1]
        h2, w2 = i.shape[0] // 2, i.shape[1] // 2
        out.append(
            0.25
            * (
                i[0 : 2 * h2 : 2, 0 : 2 * w2 : 2]
                + i[1 : 2 * h2 : 2, 0 : 2 * w2 : 2]
                + i[0 : 2 * h2 : 2, 1 : 2 * w2 : 2]
                + i[1 : 2 * h2 : 2, 1 : 2 * w2 : 2]
            )
        )
    return out


@functools.partial(
    jax.jit, static_argnames=("levels", "window", "iters")
)
def lk_track(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    pts: jnp.ndarray,  # (K, 2) positions in img0
    valid: jnp.ndarray,  # (K,)
    levels: int = 3,
    window: int = 21,
    iters: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Track pts from img0 to img1. Returns (pts1 (K, 2), ok (K,)).

    cv::calcOpticalFlowPyrLK semantics: coarse-to-fine refinement of a
    translation per keypoint; a track fails when it leaves the image or
    the spatial-gradient matrix is degenerate.
    """
    H, W = img0.shape
    r = window // 2
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dv, du = jnp.meshgrid(d, d, indexing="ij")
    du = du.reshape(-1)
    dv = dv.reshape(-1)

    pyr0 = _pyramid(img0, levels)
    pyr1 = _pyramid(img1, levels)

    def track_level(p0, flow, I0, I1):
        """One level: refine `flow` so I1(p0+flow) ~ I0(p0)."""
        def per_kp(p, f):
            xs = p[0] + du
            ys = p[1] + dv
            t0 = bilinear_sample(I0, xs, ys)
            gx = 0.5 * (
                bilinear_sample(I0, xs + 1, ys)
                - bilinear_sample(I0, xs - 1, ys)
            )
            gy = 0.5 * (
                bilinear_sample(I0, xs, ys + 1)
                - bilinear_sample(I0, xs, ys - 1)
            )
            gxx = jnp.sum(gx * gx)
            gxy = jnp.sum(gx * gy)
            gyy = jnp.sum(gy * gy)
            det = gxx * gyy - gxy * gxy
            ok = det > 1e-6

            def body(f, _):
                t1 = bilinear_sample(I1, xs + f[0], ys + f[1])
                err = t1 - t0
                bx = jnp.sum(err * gx)
                by = jnp.sum(err * gy)
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                dx = (gyy * bx - gxy * by) * inv_det
                dy = (gxx * by - gxy * bx) * inv_det
                step = jnp.where(ok, jnp.asarray([dx, dy]), jnp.zeros(2))
                return f - step, None

            f, _ = jax.lax.scan(body, f, None, length=iters)
            return f, ok

        return jax.vmap(per_kp)(p0, flow)

    scale = 2.0 ** (levels - 1)
    flow = jnp.zeros_like(pts)
    ok_all = valid
    for lvl in range(levels - 1, -1, -1):
        s = 2.0 ** lvl
        p0 = pts / s
        flow, ok = track_level(p0, flow, pyr0[lvl], pyr1[lvl])
        ok_all = ok_all & ok
        if lvl > 0:
            flow = flow * 2.0
    pts1 = pts + flow
    inside = (
        (pts1[:, 0] >= 0)
        & (pts1[:, 0] <= W - 1)
        & (pts1[:, 1] >= 0)
        & (pts1[:, 1] <= H - 1)
    )
    return pts1, ok_all & inside


@functools.partial(jax.jit, static_argnames=("max_matches",))
def flow_match_pair(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    xy0: jnp.ndarray,
    valid0: jnp.ndarray,
    xy1: jnp.ndarray,
    valid1: jnp.ndarray,
    radius: float = 3.0,
    max_matches: int = 1024,
) -> PairMatches:
    """LK-flow matching: track img0 keypoints into img1, associate each
    tracked endpoint with the nearest img1 keypoint within `radius` px
    (the reference's radiusMatch step, src/Sfm.cpp:1433-1459)."""
    pts1, ok = lk_track(img0, img1, xy0, valid0)
    # Nearest keypoint of image 1 to each tracked endpoint.
    d2 = (
        jnp.sum(pts1 * pts1, -1)[:, None]
        + jnp.sum(xy1 * xy1, -1)[None, :]
        - 2.0 * pts1 @ xy1.T
    )
    d2 = jnp.where(valid1[None, :], d2, 3.4e38)
    best = jnp.argmin(d2, axis=-1)
    bestd = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
    keep = ok & (bestd <= radius)
    score = jnp.where(keep, -bestd, -3.4e38)
    k = min(max_matches, score.shape[0])
    _, order = jax.lax.top_k(score, k)
    if k < max_matches:
        order = jnp.pad(order, (0, max_matches - k))
    pad_mask = jnp.arange(max_matches) < k
    return PairMatches(
        idx_a=order.astype(jnp.int32),
        idx_b=best[order].astype(jnp.int32),
        dist=bestd[order],
        lowe=jnp.zeros_like(bestd[order]),
        valid=keep[order] & pad_mask,
    )
