"""Point-cloud normal estimation.

Replaces PCL's NormalEstimationOMP (k=10, 8 threads; src/Sfm.cpp:1347-1358)
with a vmapped kNN-PCA: covariance of each point's k nearest neighbors,
normal = smallest-eigenvector (closed-form 3x3 eigenvector via the
cross-product trick), flipped toward the viewpoint like the reference's
flip loop (src/Sfm.cpp:1353-1358). Batched over points — the whole cloud's
normals are one fused computation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.analysis.segmentation import knn_indices


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    viewpoint: jnp.ndarray | None = None,
    k: int = 10,
) -> jnp.ndarray:
    """(N, 3) unit normals. viewpoint defaults to the origin (PCL default)."""
    if viewpoint is None:
        viewpoint = jnp.zeros(3)
    nbr = knn_indices(points, valid, k=k)
    nb = points[nbr]  # (N, k, 3)
    mean = jnp.mean(nb, axis=1, keepdims=True)
    d = nb - mean
    cov = jnp.einsum("nki,nkj->nij", d, d) / k  # (N, 3, 3)

    # Smallest eigenvector of a 3x3 symmetric matrix via one round of
    # inverse-power-like deflation: eigh is fine here (3x3 batched lowers
    # acceptably), but the closed form avoids TPU's slow small-eigh path.
    def smallest_ev(C):
        # Shift so the largest eigenvalue ~ bounded: power-iterate on
        # (tr(C) I - C), whose largest eigenvector is C's smallest.
        tr = C[0, 0] + C[1, 1] + C[2, 2]
        M = tr * jnp.eye(3) - C
        v = jnp.ones(3) / jnp.sqrt(3.0)

        def it(v, _):
            v = M @ v
            return v / (jnp.linalg.norm(v) + 1e-20), None

        v, _ = jax.lax.scan(it, v, None, length=48)
        return v

    n = jax.vmap(smallest_ev)(cov)
    # Flip toward viewpoint (src/Sfm.cpp:1353-1358).
    to_vp = viewpoint[None, :] - points
    sign = jnp.sign(jnp.sum(n * to_vp, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    return n * sign
