"""Per-frame visual-inertial state optimization with a marginal prior.

``Optimizer::PoseInertialOptimizationLastKeyFrame`` / ``LastFrame`` analog
(``/root/reference/src/Optimizer.cc:6697,7092``): at frame rate, jointly
optimize the current frame's FULL 15-dim state (body pose, velocity, gyro
bias, accel bias) against

  - the reprojection of its matched map points,
  - the IMU preintegration factor from the previous state (last keyframe
    right after an insertion, last frame otherwise),
  - bias random-walk factors between the two states, and
  - the previous state's marginal prior — the ``ConstraintPoseImu``
    carried between frames (``/root/reference/include/G2oTypes.h:703-783``).

The previous state is kept FREE under its prior (the reference fixes the
keyframe in the LastKeyFrame variant; an informative prior generalizes
both variants into one 30-dim Gauss-Newton program), and after the solve
it is marginalized out by Schur complement, producing the next frame's
prior. This is the core VIO estimator of the inertial modes: velocity and
bias are updated EVERY frame, not only at keyframes, and information flows
forward through the prior chain exactly as in the reference.

TPU shape: the whole estimator is one fixed-iteration 30-dim GN inside the
fused frame program — a [30,30] solve per iteration is negligible next to
the front-end, so per-frame VI fusion costs nothing over the pose-only
path it replaces.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.ops import imu as imu_ops
from orb_slam3_detailed_comments_kor_tpu.optim import factors
from orb_slam3_detailed_comments_kor_tpu.optim.ba import (
    CHI2_MONO, CHI2_STEREO, Observations, _robust_cost,
)
from orb_slam3_detailed_comments_kor_tpu.utils import lie


class VioState(NamedTuple):
    """One body state: world→body pose + velocity + biases."""

    R_bw: jnp.ndarray  # [3,3]
    t_bw: jnp.ndarray  # [3]
    v: jnp.ndarray     # [3] world-frame velocity
    bg: jnp.ndarray    # [3]
    ba: jnp.ndarray    # [3]


class VioPrior(NamedTuple):
    """Marginal prior on one state (ConstraintPoseImu analog,
    ``G2oTypes.h:703-783``): information matrix at a linearization point.
    Tangent ordering: [ξ(6: θ,t left-mult), v(3), bg(3), ba(3)]."""

    H: jnp.ndarray      # [15,15]
    state: VioState


def strong_prior(
    state: VioState,
    pose_info: float = 1e6,
    vel_info: float = 1e4,
    bias_info: float = 1e4,
) -> VioPrior:
    """Prior standing in for a FIXED previous state (the LastKeyFrame
    variant fixes the keyframe vertex, ``Optimizer.cc:6697``; a stiff
    finite prior is the same constraint without a special code path)."""
    d = jnp.concatenate([
        jnp.full((6,), pose_info),
        jnp.full((3,), vel_info),
        jnp.full((6,), bias_info),
    ])
    return VioPrior(H=jnp.diag(d), state=state)


def _state_residual_15(x15, st: VioState, ref: VioState):
    """15-dim tangent residual of a perturbed state vs a reference state
    (prior residual): [se3_log(T(x)·T̄⁻¹), v−v̄, bg−b̄g, ba−b̄a]."""
    dR, dt = lie.se3_exp(x15[0:6])
    R = dR @ st.R_bw
    t = dR @ st.t_bw + dt
    Rr_i, tr_i = lie.se3_inverse(ref.R_bw, ref.t_bw)
    Rd, td = lie.se3_compose(R, t, Rr_i, tr_i)
    xi = lie.se3_log(Rd, td)
    return jnp.concatenate([
        xi,
        st.v + x15[6:9] - ref.v,
        st.bg + x15[9:12] - ref.bg,
        st.ba + x15[12:15] - ref.ba,
    ])


def _inertial_residual_30(
    x30, prev: VioState, cur: VioState, pre: imu_ops.Preintegrated, gravity
):
    """EdgeInertial 9-dim residual (``G2oTypes.cc:517``) + bias random walk
    placeholder handled separately; function of the 30-dim joint tangent
    [prev ξ,v,bg,ba | cur ξ,v,bg,ba] for fwd autodiff."""
    dRp, dtp = lie.se3_exp(x30[0:6])
    Rp = dRp @ prev.R_bw
    tp = dRp @ prev.t_bw + dtp
    vp = prev.v + x30[6:9]
    bgp = prev.bg + x30[9:12]
    bap = prev.ba + x30[12:15]
    dRc, dtc = lie.se3_exp(x30[15:21])
    Rc = dRc @ cur.R_bw
    tc = dRc @ cur.t_bw + dtc
    vc = cur.v + x30[21:24]

    dbg = bgp - pre.bias_g
    dba = bap - pre.bias_a
    dR = pre.dR @ lie.so3_exp(pre.JRg @ dbg)
    dV = pre.dV + pre.JVg @ dbg + pre.JVa @ dba
    dP = pre.dP + pre.JPg @ dbg + pre.JPa @ dba
    dt = pre.dt
    p_p = -Rp.T @ tp
    p_c = -Rc.T @ tc
    r_R = lie.so3_log(dR.T @ Rp @ Rc.T)
    r_v = Rp @ (vc - vp - gravity * dt) - dV
    r_p = Rp @ (p_c - p_p - vp * dt - 0.5 * gravity * dt * dt) - dP
    return jnp.concatenate([r_R, r_v, r_p])


#: inertial covariance floor shared with the batch VI-BA solvers
_COV_FLOOR = jnp.asarray(
    (5e-4, 5e-4, 5e-4, 2e-3, 2e-3, 2e-3, 1e-3, 1e-3, 1e-3), jnp.float32
)


def frame_vi_optimize(
    prior: VioPrior,
    pre: imu_ops.Preintegrated,
    cur0: VioState,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    u_right: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    cam_params: jnp.ndarray,
    R_cb: jnp.ndarray,
    t_cb: jnp.ndarray,
    bf: float,
    gravity: jnp.ndarray,
    gyro_walk_info: float = 1e4,
    acc_walk_info: float = 1e3,
    iters: int = 3,
    cam_model: str = "pinhole",
    uv_r=None,
    rig=None,
):
    """30-dim joint GN + marginalization. Returns
    (cur: VioState, next_prior: VioPrior, inlier [M] bool, n_inliers).

    X [M,3] matched map points for the current frame; uv/u_right/
    inv_sigma2/valid [M] the corresponding measurements (the fused
    tracker's stage-2 matches). The previous state and its prior live in
    ``prior``; ``pre`` is the preintegration previous→current.
    """
    M = X.shape[0]
    obs = Observations(
        kf=jnp.zeros((M,), jnp.int32),
        lm=jnp.arange(M, dtype=jnp.int32),
        uv=uv,
        u_right=u_right,
        inv_sigma2=inv_sigma2,
        valid=valid,
    )
    if rig is not None:
        assert uv_r is not None, "rig VI optimization requires uv_r"
        obs = factors.with_rig_rows(obs, uv_r)
    delta2 = jnp.where(obs.u_right >= 0, CHI2_STEREO, CHI2_MONO)
    info9 = jnp.linalg.inv(pre.cov + jnp.diag(_COV_FLOOR**2))
    # whitening square roots (Cholesky of the information matrices)
    L9 = jnp.linalg.cholesky(
        0.5 * (info9 + info9.T) + 1e-6 * jnp.eye(9)
    )
    Hp = 0.5 * (prior.H + prior.H.T) + 1e-4 * jnp.eye(15)
    Lp = jnp.linalg.cholesky(Hp)
    dtc = jnp.maximum(pre.dt, 1e-3)
    w_rw = jnp.concatenate([
        jnp.full((3,), jnp.sqrt(gyro_walk_info / dtc)),
        jnp.full((3,), jnp.sqrt(acc_walk_info / dtc)),
    ])

    prev0 = prior.state

    def small_residuals(x30, prev, cur):
        """All non-visual residuals, whitened, as one vector [15+9+6]."""
        r_pr = Lp.T @ _state_residual_15(x30[0:15], prev, prior.state)
        r_in = L9.T @ _inertial_residual_30(x30, prev, cur, pre, gravity)
        bgp = prev.bg + x30[9:12]
        bap = prev.ba + x30[12:15]
        bgc = cur.bg + x30[24:27]
        bac = cur.ba + x30[27:30]
        r_rw = w_rw * jnp.concatenate([bgc - bgp, bac - bap])
        return jnp.concatenate([r_pr, r_in, r_rw])

    def vis_blocks(cur, active):
        """Visual residual + body-pose Jacobian blocks at the current
        state (EdgeMono/Stereo through the body pose, ``G2oTypes.h:339``)."""
        R_cw = R_cb @ cur.R_bw
        t_cw = R_cb @ cur.t_bw + t_cb
        r, row_mask, depth_ok = factors.reproj_residuals(
            R_cw[None], t_cw[None], X, obs._replace(valid=active),
            cam_params, bf, cam_model, rig=rig,
        )
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        w_h = factors.huber_weight(chi2, delta2)
        w = obs.inv_sigma2 * w_h * (active & depth_ok)
        pb = X[obs.lm] @ cur.R_bw.T + cur.t_bw
        pc = pb @ R_cb.T + t_cb
        _, Jproj, _ = factors._rig_select(
            obs, pc, cam_params, bf, cam_model, rig
        )
        eye = jnp.broadcast_to(jnp.eye(3), (pb.shape[0], 3, 3))
        dpb_dxi = jnp.concatenate([eye, -lie.hat(pb)], axis=-1)
        dpc_dxi = jnp.einsum("ij,ojk->oik", R_cb, dpb_dxi)
        Jp = -jnp.einsum("oij,ojk->oik", Jproj, dpc_dxi) * row_mask[:, :, None]
        Hv = jnp.einsum("oij,oik,o->jk", Jp, Jp, w)          # [6,6]
        bv = -jnp.einsum("oij,oi,o->j", Jp, r, w)            # [6]
        c_vis = jnp.sum(_robust_cost(chi2, delta2) * (active & depth_ok))
        return Hv, bv, c_vis, chi2, depth_ok

    def total_cost(prev, cur, active):
        rs = small_residuals(jnp.zeros(30), prev, cur)
        _, _, c_vis, _, _ = vis_blocks(cur, active)
        return jnp.sum(rs * rs) + c_vis

    def gn_iter(carry, _):
        """Damped GN iteration with ONE vis_blocks evaluation.

        The r4 body evaluated vis_blocks THREE times per iteration (step
        Hessian, candidate cost, post-step regate) plus a second
        small-residual pass — on the chip that tripled the estimator's
        obs-side work and made vio_frame_step the single largest SI
        per-frame cost (measured ~3x the fused tracker itself,
        tools/prof_micro.py). One evaluation now serves the step AND the
        regate (which therefore lags one iteration — the same cadence as
        the reference's between-rounds chi² regating, Optimizer.cc:831);
        divergence is caught by the whole-solve cost guard below instead
        of per-step acceptance."""
        prev, cur, active, lam = carry
        Hv, bv, _, chi2, dok = vis_blocks(cur, active)
        x0 = jnp.zeros(30)
        f = lambda x: small_residuals(x, prev, cur)
        r_s = f(x0)
        J_s = jax.jacfwd(f)(x0)                # [30_res, 30]
        H = J_s.T @ J_s
        b = -J_s.T @ r_s
        H = H.at[15:21, 15:21].add(Hv)
        b = b.at[15:21].add(bv)
        # damped solve with Jacobi scaling (information spans decades)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(30)
        d = jnp.sqrt(jnp.clip(jnp.diag(Hd), 1e-12, None))
        dx = jnp.linalg.solve(Hd / d[:, None] / d[None, :], b / d) / d
        ok_dx = jnp.isfinite(dx).all()
        dx = jnp.where(ok_dx, dx, jnp.zeros_like(dx))
        dRp, dtp = lie.se3_exp(dx[0:6])
        prev = VioState(
            R_bw=dRp @ prev.R_bw, t_bw=dRp @ prev.t_bw + dtp,
            v=prev.v + dx[6:9], bg=prev.bg + dx[9:12], ba=prev.ba + dx[12:15],
        )
        dRc, dtc2 = lie.se3_exp(dx[15:21])
        cur = VioState(
            R_bw=dRc @ cur.R_bw, t_bw=dRc @ cur.t_bw + dtc2,
            v=cur.v + dx[21:24], bg=cur.bg + dx[24:27], ba=cur.ba + dx[27:30],
        )
        # chi² re-gate for the NEXT iteration, from this iteration's
        # residuals (outliers can recover; one-iteration lag)
        active = obs.valid & dok & (chi2 <= delta2)
        lam = lam * 0.5  # fixed annealing; the cost guard bounds divergence
        return (prev, cur, active, lam), None

    active0 = obs.valid
    (prev_f, cur_f, active_f, _), _ = jax.lax.scan(
        gn_iter, (prev0, cur0, active0, jnp.float32(1e-3)),
        None, length=iters,
    )
    # divergence safety lives in the caller: vio_frame_step falls back to
    # the IMU-predicted state on non-finite output or low visual support
    # (the PredictStateIMU degradation path); a per-solve cost guard here
    # cost two extra full residual evaluations per frame
    cur_f = cur_f._replace(R_bw=lie.project_to_so3(cur_f.R_bw))

    # ---- marginalize the previous state (ConstraintPoseImu production) ---
    x0 = jnp.zeros(30)
    f = lambda x: small_residuals(x, prev_f, cur_f)
    J_s = jax.jacfwd(f)(x0)
    H = J_s.T @ J_s
    Hv, _, _, chi2_f, dok_f = vis_blocks(cur_f, active_f)
    H = H.at[15:21, 15:21].add(Hv)
    Hpp = H[0:15, 0:15] + 1e-6 * jnp.eye(15)
    Hpc = H[0:15, 15:30]
    Hcc = H[15:30, 15:30]
    H_marg = Hcc - Hpc.T @ jnp.linalg.solve(Hpp, Hpc)
    H_marg = 0.5 * (H_marg + H_marg.T)
    H_marg = jnp.where(jnp.isfinite(H_marg).all(), H_marg, jnp.eye(15))
    next_prior = VioPrior(H=H_marg, state=cur_f)

    inlier = active_f[:M] if rig is not None else active_f
    return cur_f, next_prior, inlier, jnp.sum(active_f)


# ----------------------------------------------------------------------
# Fused per-frame wrappers (one device dispatch each)
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def kf_prior(kf_R_cw, kf_t_cw, vel, bg, ba, R_cb, t_cb):
    """Build the LastKeyFrame-variant prior from a keyframe's VI state
    (the reference FIXES the keyframe vertex, ``Optimizer.cc:6697``; a
    stiff prior at its current state is the masked-static equivalent).
    Used right after a keyframe insertion and whenever background mapping
    rewrote map poses since the last frame (``mbMapUpdated`` analog,
    ``Tracking.cc:2967-2989``).

    The POSE is pinned hard (it comes from bundle adjustment); velocity
    and bias get moderate priors only — with deferred keyframe decisions
    the stored per-KF velocity is the DECISION frame's estimate, up to a
    few frames newer than the keyframe itself, and pinning it at σ=1 cm/s
    measurably degraded ATE vs the pose-prior baseline."""
    R_bc, t_bc = lie.se3_inverse(R_cb, t_cb)
    st = VioState(
        R_bw=R_bc @ kf_R_cw,
        t_bw=R_bc @ kf_t_cw + t_bc,
        v=vel, bg=bg, ba=ba,
    )
    return strong_prior(st, vel_info=1e2, bias_info=1e3)


@functools.partial(
    jax.jit,
    static_argnames=("bf", "scale", "cam_model", "cap", "min_inliers"),
)
def vio_frame_step(
    lm_pos,
    lm_feat,
    lm_inlier,
    frame_xy,
    frame_u_right,
    frame_level,
    frame_uv_r,
    R_cw_vis,
    t_cw_vis,
    prior: VioPrior,
    pre: imu_ops.Preintegrated,
    cam_params,
    R_cb,
    t_cb,
    gravity,
    rig,
    bf: float,
    scale: float,
    cam_model: str = "pinhole",
    cap: int = 1024,
    min_inliers: int = 15,
):
    """ONE device program refining the visually-tracked frame with the
    full 15-dim VI state (``PoseInertialOptimizationLastFrame`` /
    ``LastKeyFrame``, ``Optimizer.cc:6697,7092``).

    Inputs are the fused tracker's outputs: ``lm_feat/lm_inlier`` [L] map
    the landmark block to matched feature indices; the matched subset is
    compacted into ``cap`` static slots. Returns
    (R_cw, t_cw, cur: VioState, next_prior: VioPrior, n_vio_inliers);
    pose falls back to the IMU dead-reckoned state (and the prior to a
    stiff prior at it) when the solve diverges or visual support is below
    ``min_inliers`` — the PredictStateIMU degradation path.
    """
    L = lm_feat.shape[0]
    M = cap
    matched = lm_inlier
    slot = jnp.where(matched, jnp.cumsum(matched) - 1, M)
    slot = jnp.minimum(slot, M)
    lm_ids = jnp.arange(L, dtype=jnp.int32)
    sel = jnp.zeros((M + 1,), jnp.int32).at[slot].set(lm_ids, mode="drop")
    used = jnp.zeros((M + 1,), bool).at[slot].set(matched, mode="drop")
    sel, used = sel[:M], used[:M]
    feat = jnp.clip(lm_feat[sel], 0)
    X = lm_pos[sel]
    uv = frame_xy[feat]
    u_right = jnp.where(used, frame_u_right[feat], -1.0)
    inv_sigma2 = 1.0 / scale ** (2.0 * frame_level[feat].astype(jnp.float32))
    uv_r = None if frame_uv_r is None else frame_uv_r[feat]

    # dead-reckoned current state (prev state ∘ preintegration)
    prev = prior.state
    R_wb_p = prev.R_bw.T
    p_wb_p = -prev.R_bw.T @ prev.t_bw
    R2, p2, v2 = imu_ops.predict_state(
        pre, R_wb_p, p_wb_p, prev.v, prev.bg, prev.ba, gravity
    )
    pred = VioState(R_bw=R2.T, t_bw=-R2.T @ p2, v=v2, bg=prev.bg, ba=prev.ba)

    # initial state: visual pose + predicted velocity / carried bias
    R_bc, t_bc = lie.se3_inverse(R_cb, t_cb)
    cur0 = VioState(
        R_bw=R_bc @ R_cw_vis,
        t_bw=R_bc @ t_cw_vis + t_bc,
        v=v2, bg=prev.bg, ba=prev.ba,
    )
    cur, next_prior, _, n_in = frame_vi_optimize(
        prior, pre, cur0, X, uv, u_right, inv_sigma2, used,
        cam_params, R_cb, t_cb, bf, gravity,
        cam_model=cam_model, uv_r=uv_r, rig=rig,
    )
    finite = (
        jnp.isfinite(cur.t_bw).all()
        & jnp.isfinite(cur.v).all()
        & jnp.isfinite(next_prior.H).all()
    )
    ok = finite & (n_in >= min_inliers)
    cur = jax.tree.map(lambda a, b: jnp.where(ok, a, b), cur, pred)
    fallback_prior = strong_prior(pred, pose_info=1e4)
    next_prior = jax.tree.map(
        lambda a, b: jnp.where(ok, a, b), next_prior, fallback_prior
    )
    R_cw = R_cb @ cur.R_bw
    t_cw = R_cb @ cur.t_bw + t_cb
    return R_cw, t_cw, cur, next_prior, n_in
