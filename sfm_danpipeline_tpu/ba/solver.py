"""Levenberg-Marquardt with Schur-complement elimination of points.

From-scratch replacement for the reference's Ceres solve
(src/BundleAdjustment.cpp:115-123: AutoDiff + DENSE_SCHUR, <=500 iters).
DENSE_SCHUR is the semantic spec: eliminate the (many) 3-dof point blocks,
solve the (small) reduced camera system densely, back-substitute.

TPU formulation (SURVEY.md §7 hard part #1):
 - Per-observation Jacobian blocks from vmapped jacfwd (residuals.py).
 - Normal-equation blocks via segment_sum over the observation table:
   U (C,6,6), V (P,3,3), per-point camera coupling G (P,C,6,3), plus the
   shared-focal row/column.
 - Schur complement assembled as one big MXU contraction:
   S = U~ - sum_p G_p V_p^-1 G_p^T  ==  a (6C+1, 3P)x(3P, 6C+1) matmul.
 - Dense Cholesky solve of the (6C+1) reduced system; batched 3x3 inverse
   back-substitution for points.
 - The LM accept/reject loop is a lax.while_loop (no host round-trips).

Gauge handling: the reference runs unpinned (Ceres' LM damping tolerates the
7-dof gauge); callers may freeze cameras/focal via the fix masks
(incremental pipeline anchors camera 0).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sfm_danpipeline_tpu.config import BAConfig
from sfm_danpipeline_tpu.ba.problem import BAProblem
from sfm_danpipeline_tpu.ba.residuals import cost as ba_cost
from sfm_danpipeline_tpu.ba.residuals import jacobian_blocks


class NormalBlocks(NamedTuple):
    U: jnp.ndarray  # (C, 6, 6)
    V: jnp.ndarray  # (P, 3, 3)
    G: jnp.ndarray  # (P, C, 6, 3) camera-point coupling W scattered per point
    Hcf: jnp.ndarray  # (C, 6)
    Hpf: jnp.ndarray  # (P, 3)
    Hff: jnp.ndarray  # ()
    g_c: jnp.ndarray  # (C, 6)
    g_p: jnp.ndarray  # (P, 3)
    g_f: jnp.ndarray  # ()


def build_normal_blocks(problem: BAProblem) -> Tuple[NormalBlocks, jnp.ndarray]:
    """Assemble Gauss-Newton normal-equation blocks (and the current cost)."""
    C, P = problem.n_cameras, problem.n_points
    r, Jc, Jf, Jp = jacobian_blocks(
        problem.cameras,
        problem.focal,
        problem.points,
        problem.obs_cam,
        problem.obs_pt,
        problem.obs_xy,
        problem.obs_w,
    )
    # Frozen parameters: zero their Jacobian columns (their normal blocks are
    # re-identified later so the system stays nonsingular and delta = 0).
    cam_free = 1.0 - problem.fix_cam[problem.obs_cam].astype(Jc.dtype)
    Jc = Jc * cam_free[:, None, None]
    Jf = Jf * (1.0 - problem.fix_focal.astype(Jf.dtype))
    if problem.fix_pt is not None:
        pt_free = 1.0 - problem.fix_pt[problem.obs_pt].astype(Jp.dtype)
        Jp = Jp * pt_free[:, None, None]

    JcT = jnp.swapaxes(Jc, 1, 2)  # (O, 6, 2)
    JpT = jnp.swapaxes(Jp, 1, 2)  # (O, 3, 2)

    U = jax.ops.segment_sum(JcT @ Jc, problem.obs_cam, num_segments=C)
    V = jax.ops.segment_sum(JpT @ Jp, problem.obs_pt, num_segments=P)
    Hcf = jax.ops.segment_sum(
        (JcT @ Jf)[..., 0], problem.obs_cam, num_segments=C
    )
    Hpf = jax.ops.segment_sum(
        (JpT @ Jf)[..., 0], problem.obs_pt, num_segments=P
    )
    Hff = jnp.sum(Jf * Jf)
    g_c = jax.ops.segment_sum(
        (JcT @ r[..., None])[..., 0], problem.obs_cam, num_segments=C
    )
    g_p = jax.ops.segment_sum(
        (JpT @ r[..., None])[..., 0], problem.obs_pt, num_segments=P
    )
    g_f = jnp.sum(Jf[..., 0] * r)

    W = JcT @ Jp  # (O, 6, 3) per-observation camera-point coupling
    G = jnp.zeros((P, C, 6, 3), W.dtype)
    G = G.at[problem.obs_pt, problem.obs_cam].add(W)

    cost_val = 0.5 * jnp.sum(r * r)
    blocks = NormalBlocks(
        U=U, V=V, G=G, Hcf=Hcf, Hpf=Hpf, Hff=Hff, g_c=g_c, g_p=g_p, g_f=g_f
    )
    return blocks, cost_val


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a = M[..., 0, 0]; b = M[..., 0, 1]; c = M[..., 0, 2]
    d = M[..., 1, 0]; e = M[..., 1, 1]; f = M[..., 1, 2]
    g = M[..., 2, 0]; h = M[..., 2, 1]; i = M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    Gg = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * Cc
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack(
        [
            jnp.stack([A, D, Gg], axis=-1),
            jnp.stack([B, E, H], axis=-1),
            jnp.stack([Cc, F, I], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def schur_solve(
    blocks: NormalBlocks,
    lam: jnp.ndarray,
    fix_cam: jnp.ndarray,
    fix_focal: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve the damped normal equations via point elimination.

    Returns (delta_cam (C,6), delta_f (), delta_pt (P,3)) for the step
    H delta = -g with Marquardt damping lam * diag(H).
    """
    C = blocks.U.shape[0]
    P = blocks.V.shape[0]
    eyeC = jnp.eye(6, dtype=blocks.U.dtype)
    eyeP = jnp.eye(3, dtype=blocks.V.dtype)

    # Marquardt damping (+ small absolute floor for zero-information params).
    dU = blocks.U + lam * blocks.U * eyeC + 1e-8 * eyeC
    dV = blocks.V + lam * blocks.V * eyeP + 1e-8 * eyeP
    dff = blocks.Hff * (1.0 + lam) + 1e-8

    # Re-identify frozen cameras so the dense solve stays nonsingular.
    fixC = fix_cam.astype(dU.dtype)[:, None, None]
    dU = dU * (1.0 - fixC) + eyeC * fixC
    dff = jnp.where(fix_focal, jnp.asarray(1.0, dff.dtype), dff)

    Vinv = _inv3(dV)  # (P, 3, 3)

    # Schur pieces. G: (P, C, 6, 3) -> flat (P, C*6, 3).
    Gf = blocks.G.reshape(P, C * 6, 3)
    GV = jnp.einsum("pac,pcd->pad", Gf, Vinv)  # (P, C6, 3)
    S_cc = -jnp.einsum("pac,pbc->ab", GV, Gf)  # (C6, C6) MXU contraction
    # Add the block-diagonal damped camera blocks.
    S_cc = S_cc.reshape(C, 6, C, 6)
    S_cc = S_cc.at[jnp.arange(C), :, jnp.arange(C), :].add(dU)
    S_cc = S_cc.reshape(C * 6, C * 6)

    S_cf = blocks.Hcf.reshape(C * 6) - jnp.einsum(
        "pac,pc->a", GV, blocks.Hpf
    )
    S_ff = dff - jnp.einsum("pc,pcd,pd->", blocks.Hpf, Vinv, blocks.Hpf)

    rhs_c = -blocks.g_c.reshape(C * 6) + jnp.einsum(
        "pac,pc->a", GV, blocks.g_p
    )
    rhs_f = -blocks.g_f + jnp.einsum(
        "pc,pcd,pd->", blocks.Hpf, Vinv, blocks.g_p
    )

    # Dense reduced system (6C+1).
    n = C * 6 + 1
    S = jnp.zeros((n, n), S_cc.dtype)
    S = S.at[: C * 6, : C * 6].set(S_cc)
    S = S.at[: C * 6, -1].set(S_cf)
    S = S.at[-1, : C * 6].set(S_cf)
    S = S.at[-1, -1].set(S_ff)
    rhs = jnp.concatenate([rhs_c, rhs_f[None]])
    delta = jax.scipy.linalg.solve(S, rhs, assume_a="pos")
    delta_c = delta[: C * 6].reshape(C, 6)
    delta_f = delta[-1]

    # Back-substitute points: dV dp = -g_p - W^T dc - Hpf df.
    Wt_dc = jnp.einsum("pcab,ca->pb", blocks.G.reshape(P, C, 6, 3), delta_c)
    rhs_p = -blocks.g_p - Wt_dc - blocks.Hpf * delta_f
    delta_p = jnp.einsum("pcd,pd->pc", Vinv, rhs_p)

    delta_c = delta_c * (1.0 - fix_cam.astype(delta_c.dtype))[:, None]
    delta_f = jnp.where(fix_focal, 0.0, delta_f)
    return delta_c, delta_f, delta_p


class BAResult(NamedTuple):
    cameras: jnp.ndarray
    focal: jnp.ndarray
    points: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("config", "axis_name"))
def run_ba(
    problem: BAProblem,
    config: BAConfig = BAConfig(),
    axis_name: str | None = None,
    max_iterations: jnp.ndarray | None = None,
) -> BAResult:
    """LM loop (lax.while_loop): assemble -> Schur solve -> accept/reject.

    `max_iterations` (optional, TRACED) overrides config.max_iterations:
    the incremental pipeline runs the same compiled program with a short
    per-view budget and a long final budget — a static budget would compile
    the whole Schur-LM graph once per distinct value (2x the BA share of
    the 409 s r2 TPU warmup).

    With `axis_name` set (inside shard_map over a mesh axis), the problem's
    observation arrays are the LOCAL shard: normal-equation blocks and costs
    are psum-reduced over the axis, the reduced camera system is solved
    replicated on every device — the distributed-BA scheme of SURVEY.md §5
    (per-shard J^T J / J^T r blocks reduced with psum over ICI).
    """

    def preduce(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def cost_of(cameras, focal, points):
        return preduce(
            ba_cost(
                cameras,
                focal,
                points,
                problem.obs_cam,
                problem.obs_pt,
                problem.obs_xy,
                problem.obs_w,
            )
        )

    c0 = cost_of(problem.cameras, problem.focal, problem.points)

    def body(state):
        cameras, focal, points, lam, cur_cost, it, done = state
        prob = BAProblem(
            cameras=cameras,
            focal=focal,
            points=points,
            obs_cam=problem.obs_cam,
            obs_pt=problem.obs_pt,
            obs_xy=problem.obs_xy,
            obs_w=problem.obs_w,
            fix_cam=problem.fix_cam,
            fix_focal=problem.fix_focal,
        )
        blocks, _ = build_normal_blocks(prob)
        blocks = jax.tree_util.tree_map(preduce, blocks)
        dc, df, dp = schur_solve(
            blocks, lam, problem.fix_cam, problem.fix_focal
        )
        new_cams = cameras + dc
        new_focal = focal + df
        new_points = points + dp
        new_cost = cost_of(new_cams, new_focal, new_points)
        accept = new_cost < cur_cost
        rel_decrease = (cur_cost - new_cost) / jnp.maximum(cur_cost, 1e-20)
        cameras = jnp.where(accept, new_cams, cameras)
        focal = jnp.where(accept, new_focal, focal)
        points = jnp.where(accept, new_points, points)
        cur_cost = jnp.where(accept, new_cost, cur_cost)
        lam = jnp.where(accept, lam * config.lambda_down, lam * config.lambda_up)
        lam = jnp.clip(lam, config.min_lambda, config.max_lambda)
        # Declare convergence only in the Newton regime (small lambda): an
        # accepted-but-tiny decrease during a high-damping plateau is not
        # convergence, just a timid step.
        done = (
            accept
            & (rel_decrease < config.rtol)
            & (lam <= config.init_lambda)
        ) | (lam >= config.max_lambda)
        return cameras, focal, points, lam, cur_cost, it + 1, done

    iter_budget = (
        jnp.asarray(config.max_iterations, jnp.int32)
        if max_iterations is None
        else jnp.asarray(max_iterations, jnp.int32)
    )

    def cond(state):
        *_, it, done = state
        return (~done) & (it < iter_budget)

    init = (
        problem.cameras,
        problem.focal,
        problem.points,
        jnp.asarray(config.init_lambda, jnp.float32),
        c0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    cameras, focal, points, lam, final_cost, iters, done = jax.lax.while_loop(
        cond, body, init
    )
    return BAResult(
        cameras=cameras,
        focal=focal,
        points=points,
        initial_cost=c0,
        final_cost=final_cost,
        iterations=iters,
        converged=done | (final_cost < c0),
    )
