"""Bilinear sampling / gather helpers used by the feature kernels.

These are the jnp equivalents of the implicit subpixel access OpenCV's SIFT
performs on its Gaussian pyramid. All samplers clamp to the image border and
are safe under jit/vmap.
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W) at fractional positions (x, y) with clamping.

    x, y: arbitrary matching shapes -> returns values of that shape.
    """
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0.astype(img.dtype)
    fy = y - y0.astype(img.dtype)
    flat = img.reshape(-1)
    v00 = jnp.take(flat, y0 * W + x0)
    v01 = jnp.take(flat, y0 * W + x1)
    v10 = jnp.take(flat, y1 * W + x0)
    v11 = jnp.take(flat, y1 * W + x1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def bilinear_sample_level(
    stack: jnp.ndarray, level: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Sample stack (S, H, W) at integer level and fractional (x, y).

    level broadcasts against x/y. Used to read per-scale gradient maps for
    keypoints living at different pyramid levels of one octave.
    """
    S, H, W = stack.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0.astype(stack.dtype)
    fy = y - y0.astype(stack.dtype)
    base = jnp.clip(level, 0, S - 1) * (H * W)
    flat = stack.reshape(-1)
    v00 = jnp.take(flat, base + y0 * W + x0)
    v01 = jnp.take(flat, base + y0 * W + x1)
    v10 = jnp.take(flat, base + y1 * W + x0)
    v11 = jnp.take(flat, base + y1 * W + x1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def gather_cube(vol: jnp.ndarray, s: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Gather the 3x3x3 neighborhood of vol (S, H, W) around integer centers.

    s, y, x: (K,) integer centers (assumed >= 1 and <= dim-2; callers mask
    border candidates). Returns (K, 3, 3, 3) cubes ordered [ds, dy, dx].
    """
    S, H, W = vol.shape
    offs = jnp.arange(-1, 2)
    ss = jnp.clip(s[:, None, None, None] + offs[None, :, None, None], 0, S - 1)
    yy = jnp.clip(y[:, None, None, None] + offs[None, None, :, None], 0, H - 1)
    xx = jnp.clip(x[:, None, None, None] + offs[None, None, None, :], 0, W - 1)
    idx = (ss * H + yy) * W + xx
    return jnp.take(vol.reshape(-1), idx)
