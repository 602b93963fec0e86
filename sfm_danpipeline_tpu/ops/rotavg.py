"""Chordal (L2) rotation averaging.

Loop-closure support: on near-closed rings the incremental chain
accumulates rotation drift that per-view local BA cannot undo (the
reference never faces this — its temple sequence is a 10-view arc and its
incremental loop, src/Sfm.cpp:893-1009, only composes odometry). Rotation
averaging estimates all absolute rotations JOINTLY from the measured
relative rotations, distributing drift around every cycle, and is the
standard initializer before a global LM pass (ROUND3_NOTES backlog #3).

Method: the chordal relaxation. Minimizing
    sum_ij w_ij ||R_j - R_ij R_i||_F^2
over stacked X = [R_0; ...; R_{V-1}] (3V, 3) is the quadratic form
X^T L X with the block connection Laplacian
    L_ii = (sum_j w_ij) I_3,   L_ij = -w_ij R_ij^T ;
its bottom-3 eigenvectors solve the orthogonality-relaxed problem, and a
per-block SVD projection returns to SO(3). One eigh + one batched SVD —
both dense linear algebra XLA maps straight onto the MXU; no
data-dependent control flow.

Convention: R_i is world-to-camera; R_ij maps camera-i coordinates to
camera-j (R_ij = R_j R_i^T), matching ops/epipolar's relative pose.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def project_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation(s) in Frobenius norm: U diag(1,1,det(UV^T)) V^T.
    Batched over leading dims."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None],
         det[..., None]],
        axis=-1,
    )
    return (U * D[..., None, :]) @ Vt


@functools.partial(jax.jit, static_argnames=("n_views",))
def average_rotations(
    pair_i: jnp.ndarray,
    pair_j: jnp.ndarray,
    R_rel: jnp.ndarray,
    weights: jnp.ndarray,
    n_views: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Absolute rotations from relative measurements.

    pair_i, pair_j: (P,) int32 view indices (i -> j edges)
    R_rel:          (P, 3, 3) measured R_ij (camera i to camera j)
    weights:        (P,) float32, 0 disables an edge (fixed-shape masking)
    n_views:        static V

    Returns (R (V, 3, 3) world-to-camera, gauge-fixed so R[0] = I;
    residual (P,) chordal error ||R_j - R_ij R_i||_F per edge, for
    diagnosing bad edges). Views untouched by any positive-weight edge
    come back as arbitrary rotations — mask them caller-side.
    """
    V = n_views
    w = weights.astype(jnp.float32)
    I3 = jnp.eye(3, dtype=jnp.float32)

    # Block connection Laplacian, built by scatter-add of 3x3 blocks.
    L = jnp.zeros((V, 3, V, 3), jnp.float32)
    deg_i = jnp.zeros((V,), jnp.float32).at[pair_i].add(w)
    deg_j = jnp.zeros((V,), jnp.float32).at[pair_j].add(w)
    diag = (deg_i + deg_j)[:, None, None] * I3[None]
    L = L.at[jnp.arange(V), :, jnp.arange(V), :].add(diag)
    off = -w[:, None, None] * jnp.swapaxes(R_rel, -1, -2)  # -w R_ij^T
    L = L.at[pair_i, :, pair_j, :].add(off)
    L = L.at[pair_j, :, pair_i, :].add(jnp.swapaxes(off, -1, -2))
    Lm = L.reshape(3 * V, 3 * V)
    # Tiny ridge keeps eigh well-posed when the graph is disconnected.
    Lm = Lm + 1e-9 * jnp.eye(3 * V, dtype=jnp.float32)

    _, vecs = jnp.linalg.eigh(Lm)
    X = vecs[:, :3].reshape(V, 3, 3)  # bottom-3 eigenvectors, blocks X_i
    # The eigenvector basis is defined up to an orthogonal mixing G:
    # X_i ~ R_i G. If det(G) = -1, per-block SO(3) projection would flip
    # blocks INCONSISTENTLY; negate one eigenvector (a consistent
    # right-reflection) when the majority block determinant is negative.
    s = jnp.sign(jnp.sum(jnp.sign(jnp.linalg.det(X))))
    s = jnp.where(s == 0, 1.0, s)
    X = X.at[..., 2].multiply(s)
    R = project_so3(X)
    # Gauge: right-multiply by R[0]^T so view 0 is the identity (absolute
    # rotations are defined up to a global rotation).
    R = R @ R[0].T[None]
    res = R[pair_j] - jnp.einsum("pab,pbc->pac", R_rel, R[pair_i])
    residual = jnp.sqrt(jnp.sum(res * res, axis=(-2, -1)))
    return R, residual


@functools.partial(jax.jit, static_argnames=("n_views",))
def average_translations(
    pair_i: jnp.ndarray,
    pair_j: jnp.ndarray,
    R_abs: jnp.ndarray,  # (V, 3, 3) absolute world->cam rotations
    t_rel: jnp.ndarray,  # (P, 3) relative translations (x_j = R_ij x_i + t)
    weights: jnp.ndarray,  # (P,)
    n_views: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera centers from pairwise baseline DIRECTIONS (two-view t is
    scale-free), given absolute rotations — the translation-averaging half
    of global pose initialization.

    Each edge constrains the baseline direction: C_j - C_i ∝
    d_ij = -R_j^T t_ij. Eliminating the per-edge scale turns the objective
    into  sum_ij w ||(I - d d^T)(C_j - C_i)||^2  — a quadratic form with a
    3x3-block graph Laplacian, same shape as the chordal rotation problem.
    Its nullspace holds the 3 global translations plus the structure
    direction; a mean-center penalty deflates the translations, leaving
    the centers (up to global sign/scale — align caller-side, e.g. with
    ops/similarity.umeyama against the current estimate) as the bottom
    eigenvector. One eigh — dense MXU work, no control flow.

    Returns (C (V, 3) centers up to sign/scale with mean 0, residual (P,)
    per-edge perpendicular error at unit scene scale).
    """
    V = n_views
    w = weights.astype(jnp.float32)
    d = -jnp.einsum("pba,pb->pa", R_abs[pair_j], t_rel)
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
    M = jnp.eye(3)[None] - d[:, :, None] * d[:, None, :]  # (P, 3, 3)
    Mw = w[:, None, None] * M
    L = jnp.zeros((V, 3, V, 3), jnp.float32)
    L = L.at[pair_i, :, pair_i, :].add(Mw)
    L = L.at[pair_j, :, pair_j, :].add(Mw)
    L = L.at[pair_i, :, pair_j, :].add(-Mw)
    L = L.at[pair_j, :, pair_i, :].add(-Mw)
    Lm = L.reshape(3 * V, 3 * V)
    # Deflate the global-translation nullspace: penalize the mean center.
    # ones ⊗ I3 acting on stacked centers computes V * mean.
    T = jnp.tile(jnp.eye(3), (V, V)) / V  # (3V, 3V), (T C) = mean per block
    scale = jnp.trace(Lm) / (3 * V) + 1e-6
    Lm = Lm + scale * T
    _, vecs = jnp.linalg.eigh(Lm + 1e-9 * jnp.eye(3 * V))
    C = vecs[:, 0].reshape(V, 3)
    C = C - jnp.mean(C, axis=0, keepdims=True)
    C = C / (jnp.linalg.norm(C) + 1e-12)
    perp = jnp.einsum("pab,pb->pa", M, C[pair_j] - C[pair_i])
    residual = jnp.linalg.norm(perp, axis=-1)
    return C, residual
