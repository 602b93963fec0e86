"""Vmapped-RANSAC building blocks.

The reference delegates RANSAC to OpenCV (findEssentialMat at
src/Sfm.cpp:542,743; solvePnPRansac at src/Sfm.cpp:1153; findHomography at
src/Sfm.cpp:676). The TPU formulation (SURVEY.md §7): a *fixed* number of
hypotheses, each fit from a random minimal sample, all scored in one batched
pass — a vmap over the hypothesis axis followed by argmin. PRNG keys are
explicit so runs are bitwise deterministic (SURVEY.md §5).

Model selection uses MSAC scoring (sum of thresholded-truncated residuals)
rather than binary inlier counts: with noisy minimal fits (e.g. 8-point
essential on a narrow baseline) many hypotheses tie on counts while the
truncated loss still ranks them sharply.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def sample_indices(
    key: jax.Array,
    valid: jnp.ndarray,
    n_hypotheses: int,
    sample_size: int,
) -> jnp.ndarray:
    """Draw (n_hypotheses, sample_size) indices of valid entries.

    `valid` is a (M,) mask; entries are drawn uniformly from the valid set
    (with replacement across draws — degenerate duplicate samples simply
    produce low-scoring hypotheses, which selection discards).
    """
    count = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    # Compact valid indices to the front (stable order).
    order = jnp.argsort(~valid, stable=True)
    r = jax.random.randint(key, (n_hypotheses, sample_size), 0, count)
    return order[r]


def ransac(
    key: jax.Array,
    fit: Callable[[jnp.ndarray], jnp.ndarray],
    residuals: Callable[[jnp.ndarray], jnp.ndarray],
    valid: jnp.ndarray,
    n_hypotheses: int,
    sample_size: int,
    threshold: float | jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-budget MSAC.

    fit(sample_idx (s,)) -> model (pytree of arrays)
    residuals(model) -> (M,) nonnegative residuals (same units as threshold)
    Returns (best_model, inlier_mask (M,), inlier_count) where inliers are
    residual < threshold among valid entries.
    """
    idx = sample_indices(key, valid, n_hypotheses, sample_size)
    models = jax.vmap(fit)(idx)
    res = jax.vmap(residuals)(models)  # (H, M)
    res = jnp.where(valid[None, :], res, 0.0)  # invalid: no contribution
    truncated = jnp.minimum(res, threshold)
    scores = jnp.sum(truncated, axis=-1)
    best = jnp.argmin(scores)
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    mask = (res[best] < threshold) & valid
    return best_model, mask, jnp.sum(mask)
