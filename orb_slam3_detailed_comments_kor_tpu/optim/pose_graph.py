"""Essential-graph pose optimization (loop correction back-end).

Replaces ``Optimizer::OptimizeEssentialGraph`` (Sim3, ``Optimizer.cc:2113``)
and ``OptimizeEssentialGraph4DoF`` (``Optimizer.cc:7523``): given relative
pose measurements over the essential graph (spanning tree + strong
covisibility + loop edges), optimize all keyframe poses so the loop
discrepancy is distributed over the trajectory.

Two variants, both LM over batched edge residuals with a dense [D·K] solve:
- SE(3): r = log(T_meas⁻¹ ∘ T_i ∘ T_j⁻¹) ∈ R⁶  (stereo / RGB-D)
- Sim(3): 7-D with per-KF scale (monocular drift correction)

Edges use forward-mode autodiff (few thousand edges × small state — off the
FLOP critical path; one jit for the whole optimization).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.utils import lie


class PoseGraphEdges(NamedTuple):
    i: jnp.ndarray       # [E] int32
    j: jnp.ndarray       # [E] int32
    R_meas: jnp.ndarray  # [E,3,3] measured T_ij = T_i ∘ T_j⁻¹ (cw frames)
    t_meas: jnp.ndarray  # [E,3]
    s_meas: jnp.ndarray  # [E] relative scale (1 for SE3 edges)
    weight: jnp.ndarray  # [E] information weight
    valid: jnp.ndarray   # [E] bool


def make_edges_from_poses(
    i, j, R_cw, t_cw, weight=None
) -> PoseGraphEdges:
    """Measure relative poses from the CURRENT estimates (the reference
    takes measurements from pre-correction poses for non-loop edges)."""
    Ri, ti = R_cw[i], t_cw[i]
    Rj, tj = R_cw[j], t_cw[j]
    Rji, tji = lie.se3_inverse(Rj, tj)
    R_ij, t_ij = lie.se3_compose(Ri, ti, Rji, tji)
    E = i.shape[0]
    w = jnp.ones((E,)) if weight is None else weight
    return PoseGraphEdges(
        i=jnp.asarray(i, jnp.int32),
        j=jnp.asarray(j, jnp.int32),
        R_meas=R_ij,
        t_meas=t_ij,
        s_meas=jnp.ones((E,)),
        weight=w,
        valid=jnp.ones((E,), bool),
    )


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph_se3(
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    edges: PoseGraphEdges,
    fixed: jnp.ndarray,
    iters: int = 15,
):
    """SE(3) pose graph: minimize Σ w‖log(T_meas⁻¹ T_i T_j⁻¹)‖².

    R_cw/t_cw [K]; fixed [K] bool (loop-anchor keyframes held).
    Returns (R_cw', t_cw').
    """
    K = R_cw.shape[0]

    def edge_residual(xi_i, xi_j, e, R, t):
        dRi, dti = lie.se3_exp(xi_i)
        dRj, dtj = lie.se3_exp(xi_j)
        Ri = dRi @ R[edges.i[e]]
        ti = dRi @ t[edges.i[e]] + dti
        Rj = dRj @ R[edges.j[e]]
        tj = dRj @ t[edges.j[e]] + dtj
        Rji, tji = lie.se3_inverse(Rj, tj)
        R_ij, t_ij = lie.se3_compose(Ri, ti, Rji, tji)
        Rm_i, tm_i = lie.se3_inverse(edges.R_meas[e], edges.t_meas[e])
        Re, te = lie.se3_compose(Rm_i, tm_i, R_ij, t_ij)
        return lie.se3_log(Re, te)

    def eval_edges(R, t):
        def one(e):
            f = lambda x: edge_residual(x[:6], x[6:], e, R, t)
            x0 = jnp.zeros(12)
            return f(x0), jax.jacfwd(f)(x0)

        r, J = jax.vmap(one)(jnp.arange(edges.i.shape[0]))
        ok = edges.valid[:, None]
        r = jnp.where(ok, jnp.nan_to_num(r), 0.0)
        J = jnp.where(ok[..., None], jnp.nan_to_num(J), 0.0)
        return r, J

    def cost(R, t):
        r, _ = eval_edges(R, t)
        return jnp.sum(jnp.sum(r * r, -1) * edges.weight * edges.valid)

    def lm_iter(carry, _):
        R, t, lam, best = carry
        r, J = eval_edges(R, t)  # [E,6], [E,6,12]
        w = edges.weight * edges.valid
        JtWJ = jnp.einsum("eir,eis,e->ers", J, J, w)  # [E,12,12]
        Jt_r = -jnp.einsum("eir,ei,e->er", J, r, w)   # [E,12]
        H = jnp.zeros((K, 6, K, 6))
        b = jnp.zeros((K, 6))
        dims = jnp.arange(12)
        kf_is_j = (dims >= 6).astype(jnp.int32)
        local = dims % 6
        kf_of = jnp.stack([edges.i, edges.j], axis=-1)

        def scatter(carry, e):
            H, b = carry
            sel = kf_of[e][kf_is_j]
            H = H.at[
                sel[:, None], local[:, None], sel[None, :], local[None, :]
            ].add(JtWJ[e])
            b = b.at[sel, local].add(Jt_r[e])
            return (H, b), None

        (H, b), _ = jax.lax.scan(scatter, (H, b), jnp.arange(edges.i.shape[0]))
        Hf = H.reshape(K * 6, K * 6)
        Hf = Hf + jnp.diag(lam * jnp.diag(Hf) + 1e-6)
        fp = jnp.repeat(fixed, 6)
        Hf = jnp.where(fp[:, None] | fp[None, :], 0.0, Hf)
        Hf = Hf + jnp.diag(fp.astype(jnp.float32))
        b_flat = jnp.where(fp, 0.0, b.reshape(-1))
        d = jnp.sqrt(jnp.clip(jnp.diag(Hf), 1e-10, None))
        dx = (jnp.linalg.solve(Hf / d[:, None] / d[None, :], b_flat / d) / d
              ).reshape(K, 6)
        dR, dt = lie.se3_exp(dx)
        R_new = dR @ R
        t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
        c_new = cost(R_new, t_new)
        accept = c_new < best
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        lam = jnp.where(accept, lam * 0.33, lam * 4.0)
        best = jnp.where(accept, c_new, best)
        return (R, t, lam, best), c_new

    c0 = cost(R_cw, t_cw)
    (R, t, _, _), _ = jax.lax.scan(
        lm_iter, (R_cw, t_cw, jnp.float32(1e-4), c0), None, length=iters
    )
    return lie.project_to_so3(R), t


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph_sim3(
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    s_cw: jnp.ndarray,
    edges: PoseGraphEdges,
    fixed: jnp.ndarray,
    iters: int = 15,
):
    """Sim(3) essential graph (``Optimizer::OptimizeEssentialGraph``,
    ``Optimizer.cc:2113``): per-keyframe 7-DoF states absorb monocular
    scale drift around a loop. Minimizes
    Σ w‖log_sim3(S_meas⁻¹ ∘ S_i ∘ S_j⁻¹)‖² with loop anchors held.

    R_cw/t_cw/s_cw: [K] current Sim3 camera-from-world estimates (s=1 on
    entry for a fresh correction). Returns (R', t', s'); the caller folds
    the scale into the pose as [R | t/s] and re-maps landmarks through
    their host keyframe's correction, as the reference does in
    ``LoopClosing::CorrectLoop`` (``LoopClosing.cc:1036-1120``).
    """
    K = R_cw.shape[0]

    def edge_residual(xi_i, xi_j, e, R, t, s):
        dRi, dti, dsi = sim3_from_local(xi_i)
        dRj, dtj, dsj = sim3_from_local(xi_j)
        Ri, ti, si = lie.sim3_compose(
            dRi, dti, dsi, R[edges.i[e]], t[edges.i[e]], s[edges.i[e]]
        )
        Rj, tj, sj = lie.sim3_compose(
            dRj, dtj, dsj, R[edges.j[e]], t[edges.j[e]], s[edges.j[e]]
        )
        Rji, tji, sji = lie.sim3_inverse(Rj, tj, sj)
        R_ij, t_ij, s_ij = lie.sim3_compose(Ri, ti, si, Rji, tji, sji)
        Rm_i, tm_i, sm_i = lie.sim3_inverse(
            edges.R_meas[e], edges.t_meas[e], edges.s_meas[e]
        )
        Re, te, se = lie.sim3_compose(Rm_i, tm_i, sm_i, R_ij, t_ij, s_ij)
        # decoupled residual [log R | t | log s]: same zero set as the full
        # sim3 log, cheaper Jacobians, standard in pose-graph practice
        return jnp.concatenate(
            [lie.so3_log(Re), te, jnp.log(se)[None]]
        )

    def sim3_from_local(xi):
        """xi = [theta(3), dt(3), dsigma(1)] -> small Sim3."""
        dR = lie.so3_exp(xi[:3])
        return dR, xi[3:6], jnp.exp(xi[6])

    def eval_edges(R, t, s):
        def one(e):
            f = lambda x: edge_residual(x[:7], x[7:], e, R, t, s)
            x0 = jnp.zeros(14)
            return f(x0), jax.jacfwd(f)(x0)

        r, J = jax.vmap(one)(jnp.arange(edges.i.shape[0]))
        ok = edges.valid[:, None]
        r = jnp.where(ok, jnp.nan_to_num(r), 0.0)
        J = jnp.where(ok[..., None], jnp.nan_to_num(J), 0.0)
        return r, J

    def cost(R, t, s):
        r, _ = eval_edges(R, t, s)
        return jnp.sum(jnp.sum(r * r, -1) * edges.weight * edges.valid)

    D = 7

    def lm_iter(carry, _):
        R, t, s, lam, best = carry
        r, J = eval_edges(R, t, s)  # [E,7], [E,7,14]
        w = edges.weight * edges.valid
        JtWJ = jnp.einsum("eir,eis,e->ers", J, J, w)
        Jt_r = -jnp.einsum("eir,ei,e->er", J, r, w)
        H = jnp.zeros((K, D, K, D))
        b = jnp.zeros((K, D))
        dims = jnp.arange(2 * D)
        kf_is_j = (dims >= D).astype(jnp.int32)
        local = dims % D
        kf_of = jnp.stack([edges.i, edges.j], axis=-1)

        def scatter(carry, e):
            H, b = carry
            sel = kf_of[e][kf_is_j]
            H = H.at[
                sel[:, None], local[:, None], sel[None, :], local[None, :]
            ].add(JtWJ[e])
            b = b.at[sel, local].add(Jt_r[e])
            return (H, b), None

        (H, b), _ = jax.lax.scan(scatter, (H, b), jnp.arange(edges.i.shape[0]))
        Hf = H.reshape(K * D, K * D)
        Hf = Hf + jnp.diag(lam * jnp.diag(Hf) + 1e-6)
        fp = jnp.repeat(fixed, D)
        Hf = jnp.where(fp[:, None] | fp[None, :], 0.0, Hf)
        Hf = Hf + jnp.diag(fp.astype(jnp.float32))
        b_flat = jnp.where(fp, 0.0, b.reshape(-1))
        d = jnp.sqrt(jnp.clip(jnp.diag(Hf), 1e-10, None))
        dx = (jnp.linalg.solve(Hf / d[:, None] / d[None, :], b_flat / d) / d
              ).reshape(K, D)
        dR = lie.so3_exp(dx[:, :3])
        ds = jnp.exp(dx[:, 6])
        R_new = dR @ R
        t_new = (
            ds[:, None] * jnp.einsum("kij,kj->ki", dR, t) + dx[:, 3:6]
        )
        s_new = ds * s
        c_new = cost(R_new, t_new, s_new)
        accept = c_new < best
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        s = jnp.where(accept, s_new, s)
        lam = jnp.where(accept, lam * 0.33, lam * 4.0)
        best = jnp.where(accept, c_new, best)
        return (R, t, s, lam, best), c_new

    c0 = cost(R_cw, t_cw, s_cw)
    (R, t, s, _, _), _ = jax.lax.scan(
        lm_iter, (R_cw, t_cw, s_cw, jnp.float32(1e-4), c0), None,
        length=iters,
    )
    return lie.project_to_so3(R), t, s


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph_4dof(
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    g_dir: jnp.ndarray,
    edges: PoseGraphEdges,
    fixed: jnp.ndarray,
    iters: int = 15,
):
    """4-DoF essential graph (``Optimizer::OptimizeEssentialGraph4DoF``,
    ``Optimizer.cc:7523``): inertial maps have observable roll/pitch and
    scale (gravity), so loop corrections may only move yaw + translation.

    Full 6-D SE(3) edge residual, but the per-keyframe update is
    restricted to a rotation about the world gravity direction ``g_dir``
    plus a world translation of the camera center. Returns (R', t').
    """
    K = R_cw.shape[0]
    g_unit = g_dir / jnp.linalg.norm(g_dir)

    def apply_local(xi, R, t):
        """xi = [psi, dp(3)]: world-side yaw + camera-center shift."""
        W = lie.so3_exp(xi[0] * g_unit)     # world rotation about gravity
        # T_cw' = T_cw ∘ W⁻¹ then center += dp:
        R2 = R @ W.T
        c = -R.T @ t
        c2 = jnp.einsum("ij,j->i", W, c) + xi[1:]
        return R2, -R2 @ c2

    def edge_residual(xi_i, xi_j, e, R, t):
        Ri, ti = apply_local(xi_i, R[edges.i[e]], t[edges.i[e]])
        Rj, tj = apply_local(xi_j, R[edges.j[e]], t[edges.j[e]])
        Rji, tji = lie.se3_inverse(Rj, tj)
        R_ij, t_ij = lie.se3_compose(Ri, ti, Rji, tji)
        Rm_i, tm_i = lie.se3_inverse(edges.R_meas[e], edges.t_meas[e])
        Re, te = lie.se3_compose(Rm_i, tm_i, R_ij, t_ij)
        return lie.se3_log(Re, te)

    def eval_edges(R, t):
        def one(e):
            f = lambda x: edge_residual(x[:4], x[4:], e, R, t)
            x0 = jnp.zeros(8)
            return f(x0), jax.jacfwd(f)(x0)

        r, J = jax.vmap(one)(jnp.arange(edges.i.shape[0]))
        ok = edges.valid[:, None]
        r = jnp.where(ok, jnp.nan_to_num(r), 0.0)
        J = jnp.where(ok[..., None], jnp.nan_to_num(J), 0.0)
        return r, J

    def cost(R, t):
        r, _ = eval_edges(R, t)
        return jnp.sum(jnp.sum(r * r, -1) * edges.weight * edges.valid)

    D = 4

    def lm_iter(carry, _):
        R, t, lam, best = carry
        r, J = eval_edges(R, t)  # [E,6], [E,6,8]
        w = edges.weight * edges.valid
        JtWJ = jnp.einsum("eir,eis,e->ers", J, J, w)
        Jt_r = -jnp.einsum("eir,ei,e->er", J, r, w)
        H = jnp.zeros((K, D, K, D))
        b = jnp.zeros((K, D))
        dims = jnp.arange(2 * D)
        kf_is_j = (dims >= D).astype(jnp.int32)
        local = dims % D
        kf_of = jnp.stack([edges.i, edges.j], axis=-1)

        def scatter(carry, e):
            H, b = carry
            sel = kf_of[e][kf_is_j]
            H = H.at[
                sel[:, None], local[:, None], sel[None, :], local[None, :]
            ].add(JtWJ[e])
            b = b.at[sel, local].add(Jt_r[e])
            return (H, b), None

        (H, b), _ = jax.lax.scan(scatter, (H, b), jnp.arange(edges.i.shape[0]))
        Hf = H.reshape(K * D, K * D)
        Hf = Hf + jnp.diag(lam * jnp.diag(Hf) + 1e-6)
        fp = jnp.repeat(fixed, D)
        Hf = jnp.where(fp[:, None] | fp[None, :], 0.0, Hf)
        Hf = Hf + jnp.diag(fp.astype(jnp.float32))
        b_flat = jnp.where(fp, 0.0, b.reshape(-1))
        d = jnp.sqrt(jnp.clip(jnp.diag(Hf), 1e-10, None))
        dx = (jnp.linalg.solve(Hf / d[:, None] / d[None, :], b_flat / d) / d
              ).reshape(K, D)
        Rt_new = jax.vmap(apply_local)(dx, R, t)
        R_new, t_new = Rt_new
        c_new = cost(R_new, t_new)
        accept = c_new < best
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        lam = jnp.where(accept, lam * 0.33, lam * 4.0)
        best = jnp.where(accept, c_new, best)
        return (R, t, lam, best), c_new

    c0 = cost(R_cw, t_cw)
    (R, t, _, _), _ = jax.lax.scan(
        lm_iter, (R_cw, t_cw, jnp.float32(1e-4), c0), None, length=iters
    )
    return lie.project_to_so3(R), t
