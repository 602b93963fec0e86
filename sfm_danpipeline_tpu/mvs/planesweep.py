"""Plane-sweep depth estimation with ZNCC photometric cost.

Replaces the PMVS2 dense stage (reference: export + subprocess at
src/Sfm.cpp:1246-1303, 62-67; options level=1, wsize=7, threshold=0.7,
minImageNum, src/Sfm.cpp:1258-1264). PMVS2 is patch-based MVS; the
TPU-native formulation (SURVEY.md §7 step 6) sweeps fronto-parallel depth
planes: for every depth hypothesis the source image is homography-warped
into the reference view (one big gather), windowed ZNCC against the
reference is computed with reduce_window box sums (pure VPU work), and the
best-scoring plane per pixel wins. Depth hypotheses are vmapped — the whole
(D, H, W) cost volume is one fused XLA computation per source view.

Matching PMVS2 semantics where they matter:
 - `level=1`  -> depth maps at half resolution
 - `wsize=7`  -> 7x7 ZNCC windows
 - `threshold=0.7` -> minimum photometric score to keep a pixel
 - minImageNum -> enforced later at fusion (cross-view consistency count)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.ops.interp import bilinear_sample


class DepthMap(NamedTuple):
    depth: jnp.ndarray  # (H, W) float32, 0 where invalid
    score: jnp.ndarray  # (H, W) best ZNCC in [-1, 1]


def _window_mean(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Mean over a w x w window, SAME padding. x: (..., H, W)."""
    ones = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add, (1,) * (x.ndim - 2) + (w, w),
        (1,) * x.ndim, "SAME",
    )
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1,) * (x.ndim - 2) + (w, w),
        (1,) * x.ndim, "SAME",
    )
    return s / ones


def plane_homography(
    K: jnp.ndarray,
    R_rs: jnp.ndarray,
    t_rs: jnp.ndarray,
    depth: jnp.ndarray,
) -> jnp.ndarray:
    """Homography mapping reference pixels to source pixels for the
    fronto-parallel plane z=depth in the reference camera frame.

    R_rs, t_rs: source-from-reference transform (x_s = R_rs x_r + t_rs).
    H = K (R + t n^T / d) K^-1 with n = (0,0,1).
    """
    n = jnp.asarray([0.0, 0.0, 1.0])
    Kinv = jnp.linalg.inv(K)
    return K @ (R_rs + jnp.outer(t_rs, n) / depth) @ Kinv


@functools.partial(jax.jit, static_argnames=("window",))
def _sweep_one_source(
    ref: jnp.ndarray,  # (H, W)
    src: jnp.ndarray,  # (H, W)
    K: jnp.ndarray,
    R_rs: jnp.ndarray,
    t_rs: jnp.ndarray,
    depths: jnp.ndarray,  # (D,)
    window: int = 7,
) -> jnp.ndarray:
    """ZNCC cost volume (D, H, W) of one source view against the reference."""
    H, W = ref.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    ref_mean = _window_mean(ref, window)
    ref_zm = ref - ref_mean
    ref_var = _window_mean(ref_zm * ref_zm, window)

    def one_depth(d):
        Hm = plane_homography(K, R_rs, t_rs, d)
        xh = Hm[0, 0] * xs + Hm[0, 1] * ys + Hm[0, 2]
        yh = Hm[1, 0] * xs + Hm[1, 1] * ys + Hm[1, 2]
        wh = Hm[2, 0] * xs + Hm[2, 1] * ys + Hm[2, 2]
        wh = jnp.where(jnp.abs(wh) < 1e-9, 1e-9, wh)
        u = xh / wh
        v = yh / wh
        inside = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
        warped = bilinear_sample(src, u, v)
        w_mean = _window_mean(warped, window)
        w_zm = warped - w_mean
        w_var = _window_mean(w_zm * w_zm, window)
        cov = _window_mean(ref_zm * w_zm, window)
        zncc = cov / jnp.sqrt(
            jnp.maximum(ref_var * w_var, 1e-10)
        )
        return jnp.where(inside, zncc, -1.0)

    return jax.vmap(one_depth)(depths)


@functools.partial(jax.jit, static_argnames=("window",))
def sweep_depth_map(
    ref: jnp.ndarray,  # (H, W) reference gray
    srcs: jnp.ndarray,  # (S, H, W) source grays
    K: jnp.ndarray,
    R_rs: jnp.ndarray,  # (S, 3, 3) source-from-ref rotations
    t_rs: jnp.ndarray,  # (S, 3)
    src_valid: jnp.ndarray,  # (S,) source usable
    depths: jnp.ndarray,  # (D,) hypothesis depths (ref frame)
    min_score: float = 0.7,
    window: int = 7,
) -> DepthMap:
    """Multi-source plane sweep: per-pixel average ZNCC over valid sources,
    argmax over depth hypotheses, photometric threshold (PMVS2's 0.7)."""
    S = srcs.shape[0]

    def acc(carry, s):
        cost_sum, n = carry
        vol = _sweep_one_source(
            ref, srcs[s], K, R_rs[s], t_rs[s], depths, window=window
        )
        usable = src_valid[s].astype(ref.dtype)
        return (cost_sum + vol * usable, n + usable), None

    D = depths.shape[0]
    Hh, Ww = ref.shape
    init = (jnp.zeros((D, Hh, Ww), ref.dtype), jnp.asarray(0.0, ref.dtype))
    (cost_sum, n), _ = jax.lax.scan(acc, init, jnp.arange(S))
    cost = cost_sum / jnp.maximum(n, 1.0)
    best = jnp.argmax(cost, axis=0)
    score = jnp.max(cost, axis=0)
    # Parabolic refinement across neighboring planes (sub-plane depth).
    ip = jnp.clip(best + 1, 0, D - 1)
    im = jnp.clip(best - 1, 0, D - 1)
    cb = score
    cp = jnp.take_along_axis(cost, ip[None], axis=0)[0]
    cm = jnp.take_along_axis(cost, im[None], axis=0)[0]
    denom = cm - 2 * cb + cp
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (cm - cp) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    # Interpolate in inverse depth (hypotheses are inverse-depth uniform).
    inv = 1.0 / depths
    inv_b = jnp.take(inv, best)
    inv_step = (inv[-1] - inv[0]) / jnp.maximum(D - 1, 1)
    inv_ref = inv_b + delta * inv_step
    depth = 1.0 / jnp.maximum(inv_ref, 1e-9)
    ok = score >= min_score
    return DepthMap(
        depth=jnp.where(ok, depth, 0.0), score=jnp.where(ok, score, -1.0)
    )


def make_depth_hypotheses(
    z_samples: jnp.ndarray, n_planes: int, pad: float = 0.25
) -> jnp.ndarray:
    """Inverse-depth-uniform hypotheses covering the sparse depth range.

    z_samples: depths of sparse points in the reference camera (masked
    entries <= 0 are ignored).
    """
    valid = z_samples > 0
    z = jnp.where(valid, z_samples, jnp.nan)
    lo = jnp.nanpercentile(z, 5.0)
    hi = jnp.nanpercentile(z, 95.0)
    lo = jnp.nan_to_num(lo, nan=1.0) * (1.0 - pad)
    hi = jnp.nan_to_num(hi, nan=10.0) * (1.0 + pad)
    lo = jnp.maximum(lo, 1e-3)
    inv = jnp.linspace(1.0 / hi, 1.0 / lo, n_planes)
    return 1.0 / inv[::-1]
