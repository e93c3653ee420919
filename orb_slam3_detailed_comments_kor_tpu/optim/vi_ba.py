"""Visual-inertial bundle adjustment: 15-state keyframes + preintegration
factors + bias random walks, with Schur landmark elimination.

Replaces the reference's inertial optimizer family —
``Optimizer::LocalInertialBA`` (``src/Optimizer.cc:3959-4686``),
``FullInertialBA`` (``Optimizer.cc:397``) and the g2o types behind them
(``EdgeInertial`` ``include/G2oTypes.h:492-541``, ``EdgeGyroRW/AccRW``
``G2oTypes.h:632-702``).

State per keyframe: [ξ_pose(6) | v(3) | bg(3) | ba(3)] = 15, where pose is
T_bw (world→body) with left-multiplicative se(3) updates, velocity is in
world frame.  Reprojection factors act on the pose block through the fixed
camera-from-body extrinsic T_cb; inertial factors connect consecutive
keyframes through the 9-D preintegration residual (Forster), whitened by the
inverse preintegration covariance.

TPU design: reprojection Jacobians are analytic (same blocks as ba.py);
the ~K inertial edges use forward-mode autodiff (they are off the FLOP
critical path).  Landmarks are Schur-eliminated; the reduced system is a
dense [15K x 15K] solve — small enough to fuse the whole LM loop in one jit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.optim import ba, factors
from orb_slam3_detailed_comments_kor_tpu.optim.factors import Observations
from orb_slam3_detailed_comments_kor_tpu.utils import lie


class InertialEdges(NamedTuple):
    """Preintegration factors between keyframe pairs (usually (k, k+1))."""

    i: jnp.ndarray      # [E] int32 source kf
    j: jnp.ndarray      # [E] int32 target kf
    dt: jnp.ndarray     # [E]
    dR: jnp.ndarray     # [E,3,3]
    dV: jnp.ndarray     # [E,3]
    dP: jnp.ndarray     # [E,3]
    info9: jnp.ndarray  # [E,9,9] inverse preintegration covariance
    JRg: jnp.ndarray    # [E,3,3]
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    bias_g0: jnp.ndarray  # [E,3] linearization biases
    bias_a0: jnp.ndarray  # [E,3]
    valid: jnp.ndarray  # [E] bool


# Covariance floor applied when building edges: f32 normal equations cannot
# survive the raw preintegration information (rotation info ~1e8 vs visual ~1
# → condition number ~1e9; g2o survives because it runs in double). The
# floor keeps the VI system's conditioning inside f32 range at a negligible
# accuracy cost (the floor is far below visual noise propagated to pose).
COV_FLOOR = (5e-4, 5e-4, 5e-4, 2e-3, 2e-3, 2e-3, 1e-3, 1e-3, 1e-3)
WALK_INFO_CAP = 1e6


def make_edges(pres, i_idx, j_idx, cov_floor=COV_FLOOR) -> "InertialEdges":
    """Build InertialEdges from a list of Preintegrated (host-side helper)."""
    import numpy as _np

    E = len(pres)
    floor = jnp.diag(jnp.asarray(cov_floor, jnp.float32) ** 2)
    return InertialEdges(
        i=jnp.asarray(i_idx, jnp.int32),
        j=jnp.asarray(j_idx, jnp.int32),
        dt=jnp.stack([p.dt for p in pres]),
        dR=jnp.stack([p.dR for p in pres]),
        dV=jnp.stack([p.dV for p in pres]),
        dP=jnp.stack([p.dP for p in pres]),
        info9=jnp.stack(
            [jnp.linalg.inv(p.cov + floor) for p in pres]
        ),
        JRg=jnp.stack([p.JRg for p in pres]),
        JVg=jnp.stack([p.JVg for p in pres]),
        JVa=jnp.stack([p.JVa for p in pres]),
        JPg=jnp.stack([p.JPg for p in pres]),
        JPa=jnp.stack([p.JPa for p in pres]),
        bias_g0=jnp.stack([p.bias_g for p in pres]),
        bias_a0=jnp.stack([p.bias_a for p in pres]),
        valid=jnp.ones((E,), bool),
    )


class VIState(NamedTuple):
    R_bw: jnp.ndarray  # [K,3,3] world→body
    t_bw: jnp.ndarray  # [K,3]
    v: jnp.ndarray     # [K,3] world-frame velocity
    bg: jnp.ndarray    # [K,3]
    ba: jnp.ndarray    # [K,3]


def inertial_residual(
    R_bw_i, t_bw_i, v_i, bg_i, ba_i, R_bw_j, t_bw_j, v_j, edge_idx,
    edges: InertialEdges, gravity,
):
    """9-D residual [r_R, r_v, r_p] for one edge (EdgeInertial::computeError,
    ``src/G2oTypes.cc:517``)."""
    e = edge_idx
    dbg = bg_i - edges.bias_g0[e]
    dba = ba_i - edges.bias_a0[e]
    dR = edges.dR[e] @ lie.so3_exp(edges.JRg[e] @ dbg)
    dV = edges.dV[e] + edges.JVg[e] @ dbg + edges.JVa[e] @ dba
    dP = edges.dP[e] + edges.JPg[e] @ dbg + edges.JPa[e] @ dba
    dt = edges.dt[e]
    # R_wb_i = R_bw_i^T ; p_wb = −R_bw^T t_bw
    p_i = -R_bw_i.T @ t_bw_i
    p_j = -R_bw_j.T @ t_bw_j
    r_R = lie.so3_log(dR.T @ R_bw_i @ R_bw_j.T)
    r_v = R_bw_i @ (v_j - v_i - gravity * dt) - dV
    r_p = R_bw_i @ (p_j - p_i - v_i * dt - 0.5 * gravity * dt * dt) - dP
    return jnp.concatenate([r_R, r_v, r_p])


def _edge_residual_from_tangent(x, Ri, ti, Rj, tj, vi, vj, bgi, bai, e, edges, gravity):
    """Residual as a function of the 24-dim tangent perturbation
    [ξi(6), vi(3), bgi(3), bai(3), ξj(6), vj(3)] — autodiff target."""
    xi_i, dvi, dbg, dba, xi_j, dvj = (
        x[0:6], x[6:9], x[9:12], x[12:15], x[15:21], x[21:24]
    )
    dRi, dti = lie.se3_exp(xi_i)
    dRj, dtj = lie.se3_exp(xi_j)
    R_i = dRi @ Ri
    t_i = dRi @ ti + dti
    R_j = dRj @ Rj
    t_j = dRj @ tj + dtj
    return inertial_residual(
        R_i, t_i, vi + dvi, bgi + dbg, bai + dba, R_j, t_j, vj + dvj,
        e, edges, gravity,
    )


def eval_inertial(st: VIState, edges: InertialEdges, gravity):
    """Residuals [E,9] + Jacobians [E,9,24] for all edges via fwd autodiff."""
    def one(e):
        Ri, ti = st.R_bw[edges.i[e]], st.t_bw[edges.i[e]]
        Rj, tj = st.R_bw[edges.j[e]], st.t_bw[edges.j[e]]
        vi, vj = st.v[edges.i[e]], st.v[edges.j[e]]
        bgi, bai = st.bg[edges.i[e]], st.ba[edges.i[e]]
        f = lambda x: _edge_residual_from_tangent(
            x, Ri, ti, Rj, tj, vi, vj, bgi, bai, e, edges, gravity
        )
        x0 = jnp.zeros(24)
        return f(x0), jax.jacfwd(f)(x0)

    r, J = jax.vmap(one)(jnp.arange(edges.i.shape[0]))
    # invalid (padding) edges can sit at degenerate states whose Jacobian is
    # non-finite; 0·NaN = NaN would defeat the validity mask downstream
    ok = edges.valid[:, None]
    r = jnp.where(ok, jnp.nan_to_num(r), 0.0)
    J = jnp.where(ok[..., None], jnp.nan_to_num(J), 0.0)
    return r, J


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale", "cam_model"))
def vi_bundle_adjust(
    st: VIState,
    X: jnp.ndarray,
    obs: Observations,
    edges: InertialEdges,
    fixed_kf: jnp.ndarray,
    fixed_point: jnp.ndarray,
    cam_params: jnp.ndarray,
    R_cb: jnp.ndarray,
    t_cb: jnp.ndarray,
    bf: float,
    gravity: jnp.ndarray,
    gyro_walk_info: float,
    acc_walk_info: float,
    prior_bg_info: float = 0.0,
    prior_ba_info: float = 0.0,
    iters: int = 10,
    fix_scale: bool = True,
    cam_model: str = "pinhole",
    rig=None,
):
    """Joint VI-LM over K keyframes (15-dim each) + L landmarks.

    obs.kf indexes into the K keyframes; reprojection goes through the fixed
    extrinsic T_cb (camera-from-body).  Bias random-walk factors couple
    consecutive edges' biases with the given walk information weights.

    prior_bg_info / prior_ba_info: isotropic information pulling each free
    keyframe's bias toward its value at call time — the bFIBA priors
    (priorG/priorA, ``Optimizer.cc:397`` EdgePriorGyro/EdgePriorAcc).
    """
    K = st.R_bw.shape[0]
    L = X.shape[0]
    P = 15
    delta2 = jnp.where(obs.u_right >= 0, factors.CHI2_STEREO, factors.CHI2_MONO)
    free_kf_f = (~fixed_kf).astype(jnp.float32)
    bg_prior0 = st.bg
    ba_prior0 = st.ba

    def camera_pose(stc):
        """T_cw = T_cb ∘ T_bw."""
        R_cw = R_cb @ stc.R_bw
        t_cw = jnp.einsum("ij,kj->ki", R_cb, stc.t_bw) + t_cb
        return R_cw, t_cw

    def total_cost(stc, Xc):
        R_cw, t_cw = camera_pose(stc)
        r, _, dok = factors.reproj_residuals(R_cw, t_cw, Xc, obs, cam_params,
                                             bf, cam_model, rig=rig)
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        c_vis = jnp.sum(ba._robust_cost(chi2, delta2) * (obs.valid & dok))
        r_in, _ = eval_inertial(stc, edges, gravity)
        c_in = jnp.sum(
            jnp.einsum("ei,eij,ej->e", r_in, edges.info9, r_in) * edges.valid
        )
        # bias random walk between consecutive keyframes on the edge list
        dbg = stc.bg[edges.j] - stc.bg[edges.i]
        dba = stc.ba[edges.j] - stc.ba[edges.i]
        w_g = gyro_walk_info / jnp.maximum(edges.dt, 1e-3)
        w_a = acc_walk_info / jnp.maximum(edges.dt, 1e-3)
        c_rw = jnp.sum(
            (w_g * jnp.sum(dbg * dbg, -1) + w_a * jnp.sum(dba * dba, -1))
            * edges.valid
        )
        c_pr = prior_bg_info * jnp.sum(
            (stc.bg - bg_prior0) ** 2 * free_kf_f[:, None]
        ) + prior_ba_info * jnp.sum(
            (stc.ba - ba_prior0) ** 2 * free_kf_f[:, None]
        )
        return c_vis + c_in + c_rw + c_pr

    def lm_iter(carry, _):
        stc, Xc, lam, best_cost = carry
        R_cw, t_cw = camera_pose(stc)

        # ---- visual part: same blocks as ba.py, lifted into 15-dim ------
        r, row_mask, depth_ok = factors.reproj_residuals(
            R_cw, t_cw, Xc, obs, cam_params, bf, cam_model, rig=rig
        )
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        w_h = factors.huber_weight(chi2, delta2)
        w = obs.inv_sigma2 * w_h * (obs.valid & depth_ok)
        # Jacobian wrt body-pose tangent: ∂pc/∂ξ_b = R_cb [I | −hat(pb)]
        Rk = stc.R_bw[obs.kf]
        tk = stc.t_bw[obs.kf]
        Xo = Xc[obs.lm]
        pb = jnp.einsum("oij,oj->oi", Rk, Xo) + tk
        pc = jnp.einsum("ij,oj->oi", R_cb, pb) + t_cb
        _, Jproj, _ = factors._rig_select(obs, pc, cam_params, bf, cam_model,
                                          rig)
        eye = jnp.broadcast_to(jnp.eye(3), (pb.shape[0], 3, 3))
        dpb_dxi = jnp.concatenate([eye, -lie.hat(pb)], axis=-1)  # [O,3,6]
        dpc_dxi = jnp.einsum("ij,ojk->oik", R_cb, dpb_dxi)
        Jp = -jnp.einsum("oij,ojk->oik", Jproj, dpc_dxi) * row_mask[:, :, None]
        Jl = -jnp.einsum("oij,jk,okl->oil", Jproj,
                         R_cb, Rk) * row_mask[:, :, None]

        free_kf = (~fixed_kf).astype(jnp.float32)
        free_l = (~fixed_point).astype(jnp.float32)
        Jp = Jp * free_kf[obs.kf][:, None, None]
        Jl = Jl * free_l[obs.lm][:, None, None]

        Hpp6 = jnp.zeros((K, 6, 6)).at[obs.kf].add(
            w[:, None, None] * jnp.einsum("oij,oik->ojk", Jp, Jp)
        )
        Hll = jnp.zeros((L, 3, 3)).at[obs.lm].add(
            w[:, None, None] * jnp.einsum("oij,oik->ojk", Jl, Jl)
        )
        bp6 = jnp.zeros((K, 6)).at[obs.kf].add(
            -w[:, None] * jnp.einsum("oij,oi->oj", Jp, r)
        )
        bl = jnp.zeros((L, 3)).at[obs.lm].add(
            -w[:, None] * jnp.einsum("oij,oi->oj", Jl, r)
        )
        Wpl = jnp.zeros((K, 6, L, 3)).at[obs.kf, :, obs.lm, :].add(
            w[:, None, None] * jnp.einsum("oij,oik->ojk", Jp, Jl)
        )

        Hll_d = Hll + lam * jnp.eye(3)[None] * (
            jnp.trace(Hll, axis1=-2, axis2=-1)[:, None, None] / 3.0 + 1e-3
        )
        Hll_d = jnp.where(fixed_point[:, None, None], jnp.eye(3)[None], Hll_d)
        Hll_inv = jnp.linalg.inv(Hll_d)
        Y = jnp.einsum("kilm,lmn->kiln", Wpl, Hll_inv)
        S6 = -jnp.einsum("kiln,pjln->kipj", Y, Wpl)
        S6 = S6.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp6)
        b6 = bp6 - jnp.einsum("kiln,ln->ki", Y, bl)

        # ---- lift into the 15-dim system --------------------------------
        S = jnp.zeros((K, P, K, P))
        S = S.at[:, 0:6, :, 0:6].add(S6)
        b = jnp.zeros((K, P))
        b = b.at[:, 0:6].add(b6)

        # ---- inertial edges (autodiff blocks) ---------------------------
        r_in, J_in = eval_inertial(stc, edges, gravity)  # [E,9],[E,9,24]
        w_edge = edges.valid.astype(jnp.float32)
        # per-edge 24-dim layout: [ξi(6) vi(3) bgi(3) bai(3) ξj(6) vj(3)]
        # map to state blocks: i-block rows 0:15 = [ξi vi bgi bai],
        # j-block rows 15:21 ξj → j 0:6; 21:24 vj → j 6:9
        # JtW[e] = Jᵀ·Info·J [24,24];  Jt_r[e] = −Jᵀ·Info·r [24]
        JtW = jnp.einsum("eir,eis->ers", J_in * w_edge[:, None, None],
                         jnp.einsum("eij,ejk->eik", edges.info9, J_in))
        Jt_r = -jnp.einsum(
            "eir,eij,ej->er", J_in * w_edge[:, None, None], edges.info9, r_in
        )  # [E,24]

        # index maps from the 24 local dims to (kf, state-dim)
        local_kf_is_j = jnp.concatenate(
            [jnp.zeros(15, jnp.int32), jnp.ones(9, jnp.int32)]
        )  # 0 → i, 1 → j
        local_dim = jnp.concatenate(
            [jnp.arange(15), jnp.arange(6), jnp.arange(6, 9)]
        )

        kf_of = jnp.stack([edges.i, edges.j], axis=-1)  # [E,2]

        # ONE batched scatter over all edges (the earlier per-edge lax.scan
        # serialized ~200 tiny device ops per LM iteration — at keyframe
        # rate that was the dominant mapping-step latency)
        ksel = kf_of[:, local_kf_is_j]                       # [E,24]
        S = S.at[
            ksel[:, :, None], local_dim[None, :, None],
            ksel[:, None, :], local_dim[None, None, :],
        ].add(JtW)
        b = b.at[ksel, local_dim[None, :]].add(Jt_r)

        # ---- bias random-walk factors (batched over edges) ---------------
        w_g = gyro_walk_info / jnp.maximum(edges.dt, 1e-3) * w_edge
        w_a = acc_walk_info / jnp.maximum(edges.dt, 1e-3) * w_edge
        dbg = stc.bg[edges.j] - stc.bg[edges.i]
        dba = stc.ba[edges.j] - stc.ba[edges.i]
        d3 = jnp.arange(3)
        ii = edges.i[:, None]
        jj = edges.j[:, None]
        for (dim0, wgt, db) in ((9, w_g, dbg), (12, w_a, dba)):
            dd = (d3 + dim0)[None, :]
            w3 = wgt[:, None] * jnp.ones((1, 3))
            S = S.at[ii, dd, ii, dd].add(w3)
            S = S.at[jj, dd, jj, dd].add(w3)
            S = S.at[ii, dd, jj, dd].add(-w3)
            S = S.at[jj, dd, ii, dd].add(-w3)
            b = b.at[ii, dd].add(wgt[:, None] * db)
            b = b.at[jj, dd].add(-wgt[:, None] * db)

        # ---- bias priors (bFIBA): gradient + diagonal information --------
        b = b.at[:, 9:12].add(-prior_bg_info * (stc.bg - bg_prior0))
        b = b.at[:, 12:15].add(-prior_ba_info * (stc.ba - ba_prior0))
        kk = jnp.arange(K)[:, None]
        dgp = jnp.arange(9, 12)[None, :]
        dap = jnp.arange(12, 15)[None, :]
        S = S.at[kk, dgp, kk, dgp].add(prior_bg_info)
        S = S.at[kk, dap, kk, dap].add(prior_ba_info)

        # ---- damping, fixing, solve -------------------------------------
        Sf = S.reshape(K * P, K * P)
        diag = jnp.diag(Sf)
        Sf = Sf + jnp.diag(lam * diag + 1e-6)
        fp = jnp.repeat(fixed_kf, P)
        Sf = jnp.where(fp[:, None] | fp[None, :], 0.0, Sf)
        Sf = Sf + jnp.diag(fp.astype(jnp.float32))
        b_flat = jnp.where(fp, 0.0, b.reshape(-1))
        # Jacobi scaling: the mixed visual(+1)/inertial(~1e8) information
        # spans >10 decades — raw f32 LU loses the solution. Normalize to
        # unit diagonal, solve, unscale.
        d = jnp.sqrt(jnp.clip(jnp.diag(Sf), 1e-10, None))
        Sn = Sf / d[:, None] / d[None, :]
        dx = (jnp.linalg.solve(Sn, b_flat / d) / d).reshape(K, P)

        dl = jnp.einsum(
            "lmn,ln->lm", Hll_inv,
            bl - jnp.einsum("kiln,ki->ln", Wpl, dx[:, 0:6]),
        ) * free_l[:, None]

        dRb, dtb = lie.se3_exp(dx[:, 0:6])
        st_new = VIState(
            R_bw=dRb @ stc.R_bw,
            t_bw=jnp.einsum("kij,kj->ki", dRb, stc.t_bw) + dtb,
            v=stc.v + dx[:, 6:9],
            bg=stc.bg + dx[:, 9:12],
            ba=stc.ba + dx[:, 12:15],
        )
        X_new = Xc + dl
        cost_new = total_cost(st_new, X_new)
        accept = (
            (cost_new < best_cost)
            & jnp.isfinite(dx).all() & jnp.isfinite(dl).all()
        )
        stc = jax.tree.map(lambda n, o: jnp.where(accept, n, o), st_new, stc)
        Xc = jnp.where(accept, X_new, Xc)
        lam = jnp.where(accept, lam * 0.33, lam * 4.0)
        best_cost = jnp.where(accept, cost_new, best_cost)
        return (stc, Xc, lam, best_cost), cost_new

    cost0 = total_cost(st, X)
    (st_f, X_f, _, _), costs = jax.lax.scan(
        lm_iter, (st, X, jnp.float32(1e-4), cost0), None, length=iters
    )
    st_f = st_f._replace(R_bw=lie.project_to_so3(st_f.R_bw))
    return st_f, X_f, jnp.concatenate([cost0[None], costs])


# ---------------------------------------------------------------------------
# Whole-map visual-inertial BA: matrix-free PCG on the 15-state reduced
# system (FullInertialBA analog, ``src/Optimizer.cc:397``).
#
# The dense vi_bundle_adjust above materializes the pose-landmark coupling
# Wpl as [K,6,L,3] — fine for a 10-KF sliding window, ~1.2 GB at map scale.
# Here the landmark elimination is matrix-free exactly as in
# ``ba.bundle_adjust_cg`` (two gathers + two scatter-adds per matvec over
# the flat observation table), and the ~K inertial chain edges + bias
# random walks enter the matvec as one batched gather→[E,24,24]→scatter.
# Memory is O(obs + E·576 + K·225): GBA-sized inertial maps fit on chip.
#
# Used (a) after IMU initialization with bias priors — the reference's
# bFIBA call (``src/LocalMapping.cc:1712-1720``) — and (b) as the global BA
# for inertial maps after loop closure (``src/LoopClosing.cc:2287-2289``),
# where the previous rounds ran visual-only reprojection GBA and silently
# dropped velocities/biases/gravity consistency.
# ---------------------------------------------------------------------------


# local-24 → (which KF of the edge, state dim) index maps used by both the
# dense and matrix-free assemblers: [ξi(6) vi(3) bgi(3) bai(3) | ξj(6) vj(3)]
_L24_IS_J = jnp.concatenate(
    [jnp.zeros(15, jnp.int32), jnp.ones(9, jnp.int32)]
)
_L24_DIM = jnp.concatenate([jnp.arange(15), jnp.arange(6), jnp.arange(6, 9)])


@functools.partial(
    jax.jit,
    static_argnames=("iters", "cg_iters", "cam_model"),
)
def vi_bundle_adjust_cg(
    st: VIState,
    X: jnp.ndarray,
    obs: Observations,
    edges: InertialEdges,
    fixed_kf: jnp.ndarray,
    fixed_point: jnp.ndarray,
    cam_params: jnp.ndarray,
    R_cb: jnp.ndarray,
    t_cb: jnp.ndarray,
    bf: float,
    gravity: jnp.ndarray,
    gyro_walk_info: float,
    acc_walk_info: float,
    prior_bg_info: float = 0.0,
    prior_ba_info: float = 0.0,
    iters: int = 8,
    cg_iters: int = 24,
    cam_model: str = "pinhole",
    rig=None,
):
    """Whole-map VI LM: same state/factor model as :func:`vi_bundle_adjust`
    but with matrix-free Schur landmark elimination + block-Jacobi PCG on
    the [K,15] reduced system, so K and L are map-capacity sized.

    prior_bg_info / prior_ba_info: isotropic information pulling every
    keyframe's bias toward its INITIAL value this call — the bFIBA priors
    (priorG/priorA, ``Optimizer.cc:397`` EdgePriorGyro/EdgePriorAcc).

    Returns (VIState, X, costs [iters+1]).
    """
    K = st.R_bw.shape[0]
    L = X.shape[0]
    P = 15
    delta2 = jnp.where(obs.u_right >= 0, factors.CHI2_STEREO, factors.CHI2_MONO)
    eye3 = jnp.eye(3)
    free_kf = (~fixed_kf).astype(jnp.float32)
    free_l = (~fixed_point).astype(jnp.float32)
    bg_prior0 = st.bg
    ba_prior0 = st.ba

    def camera_pose(stc):
        R_cw = R_cb @ stc.R_bw
        t_cw = jnp.einsum("ij,kj->ki", R_cb, stc.t_bw) + t_cb
        return R_cw, t_cw

    def total_cost(stc, Xc):
        R_cw, t_cw = camera_pose(stc)
        r, _, dok = factors.reproj_residuals(R_cw, t_cw, Xc, obs, cam_params,
                                             bf, cam_model, rig=rig)
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        c_vis = jnp.sum(ba._robust_cost(chi2, delta2) * (obs.valid & dok))
        r_in, _ = eval_inertial(stc, edges, gravity)
        c_in = jnp.sum(
            jnp.einsum("ei,eij,ej->e", r_in, edges.info9, r_in) * edges.valid
        )
        dbg = stc.bg[edges.j] - stc.bg[edges.i]
        dba = stc.ba[edges.j] - stc.ba[edges.i]
        w_g = gyro_walk_info / jnp.maximum(edges.dt, 1e-3)
        w_a = acc_walk_info / jnp.maximum(edges.dt, 1e-3)
        c_rw = jnp.sum(
            (w_g * jnp.sum(dbg * dbg, -1) + w_a * jnp.sum(dba * dba, -1))
            * edges.valid
        )
        c_pr = prior_bg_info * jnp.sum(
            (stc.bg - bg_prior0) ** 2 * free_kf[:, None]
        ) + prior_ba_info * jnp.sum(
            (stc.ba - ba_prior0) ** 2 * free_kf[:, None]
        )
        return c_vis + c_in + c_rw + c_pr

    def lm_iter(carry, _):
        stc, Xc, lam, best_cost = carry
        R_cw, t_cw = camera_pose(stc)

        # ---- visual blocks (body-pose tangent, dims 0:6) -----------------
        r, row_mask, depth_ok = factors.reproj_residuals(
            R_cw, t_cw, Xc, obs, cam_params, bf, cam_model, rig=rig
        )
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        w_h = factors.huber_weight(chi2, delta2)
        w = obs.inv_sigma2 * w_h * (obs.valid & depth_ok)
        Rk = stc.R_bw[obs.kf]
        tk = stc.t_bw[obs.kf]
        Xo = Xc[obs.lm]
        pb = jnp.einsum("oij,oj->oi", Rk, Xo) + tk
        pc = jnp.einsum("ij,oj->oi", R_cb, pb) + t_cb
        _, Jproj, _ = factors._rig_select(obs, pc, cam_params, bf, cam_model,
                                          rig)
        eyeO = jnp.broadcast_to(jnp.eye(3), (pb.shape[0], 3, 3))
        dpb_dxi = jnp.concatenate([eyeO, -lie.hat(pb)], axis=-1)
        dpc_dxi = jnp.einsum("ij,ojk->oik", R_cb, dpb_dxi)
        Jp = -jnp.einsum("oij,ojk->oik", Jproj, dpc_dxi) * row_mask[:, :, None]
        Jl = -jnp.einsum("oij,jk,okl->oil", Jproj, R_cb, Rk) * row_mask[:, :, None]

        Hpp6 = jnp.zeros((K, 6, 6)).at[obs.kf].add(
            w[:, None, None] * jnp.einsum("oij,oik->ojk", Jp, Jp)
        )
        Hll = jnp.zeros((L, 3, 3)).at[obs.lm].add(
            w[:, None, None] * jnp.einsum("oij,oik->ojk", Jl, Jl)
        )
        bp6 = jnp.zeros((K, 6)).at[obs.kf].add(
            -w[:, None] * jnp.einsum("oij,oi->oj", Jp, r)
        ) * free_kf[:, None]
        bl = jnp.zeros((L, 3)).at[obs.lm].add(
            -w[:, None] * jnp.einsum("oij,oi->oj", Jl, r)
        ) * free_l[:, None]
        A = (w * free_kf[obs.kf] * free_l[obs.lm])[:, None, None] * jnp.einsum(
            "oij,oik->ojk", Jp, Jl
        )  # [O,6,3]

        Hll_d = Hll + lam * eye3[None] * (
            jnp.trace(Hll, axis1=-2, axis2=-1)[:, None, None] / 3.0 + 1e-3
        )
        Hll_d = jnp.where(fixed_point[:, None, None], eye3[None], Hll_d)
        Hll_inv = jnp.linalg.inv(Hll_d)

        # ---- inertial edge blocks (autodiff, batched) --------------------
        r_in, J_in = eval_inertial(stc, edges, gravity)  # [E,9],[E,9,24]
        # zero rows/cols of fixed keyframes at the source
        kf_of = jnp.stack([edges.i, edges.j], axis=-1)    # [E,2]
        ksel = kf_of[:, _L24_IS_J]                         # [E,24]
        free24 = free_kf[ksel]                             # [E,24]
        w_edge = edges.valid.astype(jnp.float32)
        Jw = J_in * w_edge[:, None, None]
        JtW = jnp.einsum("eir,eis->ers", Jw,
                         jnp.einsum("eij,ejk->eik", edges.info9, J_in))
        JtW = JtW * free24[:, :, None] * free24[:, None, :]
        Jt_r = -jnp.einsum("eir,eij,ej->er", Jw, edges.info9, r_in) * free24

        # ---- bias random walk (diagonal per-dim couplings) ----------------
        w_g = gyro_walk_info / jnp.maximum(edges.dt, 1e-3) * w_edge
        w_a = acc_walk_info / jnp.maximum(edges.dt, 1e-3) * w_edge
        dbg = stc.bg[edges.j] - stc.bg[edges.i]
        dba = stc.ba[edges.j] - stc.ba[edges.i]
        rw_fi = free_kf[edges.i]
        rw_fj = free_kf[edges.j]

        # ---- RHS assembly --------------------------------------------------
        b = jnp.zeros((K, P))
        b = b.at[:, 0:6].add(bp6)
        # visual Schur RHS part: − W Hll⁻¹ bl
        y0 = jnp.einsum("lmn,ln->lm", Hll_inv, bl)
        Wy0 = jnp.zeros((K, 6)).at[obs.kf].add(
            jnp.einsum("oij,oj->oi", A, y0[obs.lm])
        )
        b = b.at[:, 0:6].add(-Wy0)
        b = b.at[ksel, _L24_DIM[None, :]].add(Jt_r)
        for (dim0, wgt, db) in ((9, w_g, dbg), (12, w_a, dba)):
            sl = slice(dim0, dim0 + 3)
            b = b.at[edges.i, sl].add(
                (wgt * rw_fi)[:, None] * db
            )
            b = b.at[edges.j, sl].add(
                -(wgt * rw_fj)[:, None] * db
            )
        # bias prior gradient (residual = b_cur − b0; zero at the first
        # iteration, nonzero once a step was accepted)
        b = b.at[:, 9:12].add(-prior_bg_info * (stc.bg - bg_prior0))
        b = b.at[:, 12:15].add(-prior_ba_info * (stc.ba - ba_prior0))
        b = jnp.where(fixed_kf[:, None], 0.0, b)

        # ---- diagonal blocks (preconditioner + damping target) -----------
        D = jnp.zeros((K, P, P))
        D = D.at[:, 0:6, 0:6].add(Hpp6)
        # inertial edge diagonal blocks: i-i [0:15]² and j-j [15:24]²
        D = D.at[edges.i, 0:15, 0:15].add(JtW[:, 0:15, 0:15])
        jdim = _L24_DIM[15:24]
        D = D.at[
            edges.j[:, None, None], jdim[None, :, None], jdim[None, None, :]
        ].add(JtW[:, 15:24, 15:24])
        d3 = jnp.arange(3)
        for (dim0, wgt) in ((9, w_g), (12, w_a)):
            dd = (d3 + dim0)[None, :]
            D = D.at[edges.i[:, None], dd, dd].add((wgt * rw_fi)[:, None])
            D = D.at[edges.j[:, None], dd, dd].add((wgt * rw_fj)[:, None])
        pr = jnp.zeros((P,)).at[9:12].set(prior_bg_info).at[12:15].set(
            prior_ba_info
        )
        D = D + jnp.diag(pr)[None]
        # damping + fixing
        diagD = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(D))
        D_d = D + lam * diagD + 1e-6 * jnp.eye(P)[None]
        D_d = jnp.where(fixed_kf[:, None, None], jnp.eye(P)[None], D_d)

        # off-diagonal inertial coupling blocks for the matvec: i-j and j-i
        JtW_ij = JtW[:, 0:15, 15:24]  # [E,15,9]

        def matvec(v):
            """S·v for v [K,P]: visual Schur part on dims 0:6 + inertial."""
            v6 = v[:, 0:6]
            u = jnp.zeros((L, 3), v.dtype).at[obs.lm].add(
                jnp.einsum("oij,oi->oj", A, v6[obs.kf])
            )
            y = jnp.einsum("lmn,ln->lm", Hll_inv, u)
            Wy = jnp.zeros((K, 6), v.dtype).at[obs.kf].add(
                jnp.einsum("oij,oj->oi", A, y[obs.lm])
            )
            Sv = jnp.einsum("kij,kj->ki", D_d, v)
            Sv = Sv.at[:, 0:6].add(-Wy)
            # inertial off-diagonal: rows i get JtW_ij · v_j9; rows j get
            # JtW_ijᵀ · v_i15 (v_j9 = v[j, jdim], scatter back likewise)
            v_j9 = v[edges.j][:, jdim]
            v_i15 = v[edges.i][:, 0:15]
            Sv = Sv.at[edges.i, 0:15].add(
                jnp.einsum("eij,ej->ei", JtW_ij, v_j9)
            )
            Sv = Sv.at[edges.j[:, None], jdim[None, :]].add(
                jnp.einsum("eij,ei->ej", JtW_ij, v_i15)
            )
            # bias RW off-diagonal: −w between i and j per dim
            for (dim0, wgt) in ((9, w_g), (12, w_a)):
                sl = slice(dim0, dim0 + 3)
                wf = (wgt * rw_fi * rw_fj)[:, None]
                Sv = Sv.at[edges.i, sl].add(-wf * v[edges.j, sl])
                Sv = Sv.at[edges.j, sl].add(-wf * v[edges.i, sl])
            return jnp.where(fixed_kf[:, None], v, Sv)

        Minv = jnp.linalg.inv(D_d)
        dx = ba._pcg(matvec, b, Minv, cg_iters)
        dx = dx * free_kf[:, None]
        # back-substitute landmarks from the pose-block update
        u = jnp.zeros((L, 3)).at[obs.lm].add(
            jnp.einsum("oij,oi->oj", A, dx[obs.kf, 0:6])
        )
        dl = jnp.einsum("lmn,ln->lm", Hll_inv, bl - u) * free_l[:, None]

        dRb, dtb = lie.se3_exp(dx[:, 0:6])
        st_new = VIState(
            R_bw=dRb @ stc.R_bw,
            t_bw=jnp.einsum("kij,kj->ki", dRb, stc.t_bw) + dtb,
            v=stc.v + dx[:, 6:9],
            bg=stc.bg + dx[:, 9:12],
            ba=stc.ba + dx[:, 12:15],
        )
        X_new = Xc + dl
        cost_new = total_cost(st_new, X_new)
        accept = (
            (cost_new < best_cost)
            & jnp.isfinite(dx).all() & jnp.isfinite(dl).all()
        )
        stc = jax.tree.map(lambda n, o: jnp.where(accept, n, o), st_new, stc)
        Xc = jnp.where(accept, X_new, Xc)
        lam = jnp.where(accept, lam * 0.33, lam * 4.0)
        best_cost = jnp.where(accept, cost_new, best_cost)
        return (stc, Xc, lam, best_cost), cost_new

    cost0 = total_cost(st, X)
    (st_f, X_f, _, _), costs = jax.lax.scan(
        lm_iter, (st, X, jnp.float32(1e-4), cost0), None, length=iters
    )
    st_f = st_f._replace(R_bw=lie.project_to_so3(st_f.R_bw))
    return st_f, X_f, jnp.concatenate([cost0[None], costs])
