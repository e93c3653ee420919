"""Inertial keyframe state + the VI local-mapping step.

Host-facing glue between the tracking system and the inertial optimizers:
keeps per-keyframe velocity/bias and the preintegration from the previous
keyframe (the reference stores these on ``KeyFrame`` — ``KeyFrame.h:270-275``
mpImuPreintegrated / prev-next chain), provides the IMU-initialization
routine (``LocalMapping::InitializeIMU``, ``LocalMapping.cc:1566``) and the
windowed local inertial BA (``LocalMapping.cc:185`` →
``Optimizer::LocalInertialBA``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.ops import imu as imu_ops
from orb_slam3_detailed_comments_kor_tpu.optim import factors, vi_ba, vi_init
from orb_slam3_detailed_comments_kor_tpu.slam import map_state as msx
from orb_slam3_detailed_comments_kor_tpu.utils import lie


class InertialKF(NamedTuple):
    """Per-keyframe inertial state, capacity K (parallel to MapState)."""

    vel: jnp.ndarray      # [K,3] world velocity
    bg: jnp.ndarray       # [K,3]
    ba: jnp.ndarray       # [K,3]
    # preintegration from the PREVIOUS keyframe to this one
    pre_dt: jnp.ndarray   # [K]
    pre_dR: jnp.ndarray   # [K,3,3]
    pre_dV: jnp.ndarray   # [K,3]
    pre_dP: jnp.ndarray   # [K,3]
    pre_cov: jnp.ndarray  # [K,9,9]
    pre_JRg: jnp.ndarray  # [K,3,3]
    pre_JVg: jnp.ndarray
    pre_JVa: jnp.ndarray
    pre_JPg: jnp.ndarray
    pre_JPa: jnp.ndarray
    pre_bg0: jnp.ndarray  # [K,3] linearization bias
    pre_ba0: jnp.ndarray
    pre_valid: jnp.ndarray  # [K] bool (false for KF0 / after map reset)


def empty_inertial(max_kf: int) -> InertialKF:
    K = max_kf
    return InertialKF(
        vel=jnp.zeros((K, 3)),
        bg=jnp.zeros((K, 3)),
        ba=jnp.zeros((K, 3)),
        pre_dt=jnp.zeros((K,)),
        pre_dR=jnp.tile(jnp.eye(3)[None], (K, 1, 1)),
        pre_dV=jnp.zeros((K, 3)),
        pre_dP=jnp.zeros((K, 3)),
        pre_cov=jnp.zeros((K, 9, 9)),
        pre_JRg=jnp.zeros((K, 3, 3)),
        pre_JVg=jnp.zeros((K, 3, 3)),
        pre_JVa=jnp.zeros((K, 3, 3)),
        pre_JPg=jnp.zeros((K, 3, 3)),
        pre_JPa=jnp.zeros((K, 3, 3)),
        pre_bg0=jnp.zeros((K, 3)),
        pre_ba0=jnp.zeros((K, 3)),
        pre_valid=jnp.zeros((K,), bool),
    )


def store_preintegration(
    ikf: InertialKF, kf_idx, pre: imu_ops.Preintegrated, vel
) -> InertialKF:
    i = kf_idx
    return ikf._replace(
        vel=ikf.vel.at[i].set(vel),
        pre_dt=ikf.pre_dt.at[i].set(pre.dt),
        pre_dR=ikf.pre_dR.at[i].set(pre.dR),
        pre_dV=ikf.pre_dV.at[i].set(pre.dV),
        pre_dP=ikf.pre_dP.at[i].set(pre.dP),
        pre_cov=ikf.pre_cov.at[i].set(pre.cov),
        pre_JRg=ikf.pre_JRg.at[i].set(pre.JRg),
        pre_JVg=ikf.pre_JVg.at[i].set(pre.JVg),
        pre_JVa=ikf.pre_JVa.at[i].set(pre.JVa),
        pre_JPg=ikf.pre_JPg.at[i].set(pre.JPg),
        pre_JPa=ikf.pre_JPa.at[i].set(pre.JPa),
        pre_bg0=ikf.pre_bg0.at[i].set(pre.bias_g),
        pre_ba0=ikf.pre_ba0.at[i].set(pre.bias_a),
        pre_valid=ikf.pre_valid.at[i].set(pre.dt > 1e-6),
    )


@functools.partial(jax.jit, static_argnames=("sigma_g", "sigma_a"))
def advance_imu(batch, bg, ba, sigma_g: float, sigma_a: float, pre_run,
                kf_R_cw, kf_t_cw, vel, gravity, R_cb, t_cb):
    """Fused per-frame IMU pipeline (hot inertial path): integrate the
    frame's sample window, fold it into the running since-keyframe
    composition, and dead-reckon the camera pose from the last keyframe's
    VI state — ONE device dispatch instead of three per tracked frame
    (integrate + compose + predict each cost a dispatch through a remote
    device tunnel). Returns (segment, run, R_pred, t_pred, v_pred)."""
    seg = imu_ops.integrate(batch, bg, ba, sigma_g, sigma_a)
    run = imu_ops.compose(pre_run, seg)
    R_pred, t_pred, v2 = predict_from_pre(
        run, kf_R_cw, kf_t_cw, vel, bg, ba, gravity, R_cb, t_cb
    )
    return seg, run, R_pred, t_pred, v2


@jax.jit
def predict_from_pre(pre: imu_ops.Preintegrated, kf_R_cw, kf_t_cw, vel,
                     bg, ba, gravity, R_cb, t_cb):
    """One-dispatch PredictStateIMU (``Tracking.cc:1561``): dead-reckon the
    camera pose from a keyframe's VI state through a preintegrated window."""
    R_bc, t_bc = lie.se3_inverse(R_cb, t_cb)
    R_bw_kf = R_bc @ kf_R_cw
    t_bw_kf = R_bc @ kf_t_cw + t_bc
    R_wb = R_bw_kf.T
    p_wb = -R_bw_kf.T @ t_bw_kf
    R2, p2, v2 = imu_ops.predict_state(pre, R_wb, p_wb, vel, bg, ba, gravity)
    R_bw2 = R2.T
    t_bw2 = -R2.T @ p2
    R_pred, t_pred = lie.se3_compose(R_cb, t_cb, R_bw2, t_bw2)
    return R_pred, t_pred, v2


@jax.jit
def merge_and_compact(ikf: InertialKF, keep: jnp.ndarray) -> InertialKF:
    """Inertial-chain counterpart of keyframe culling + slot compaction.

    keep [K]: validity mask BEFORE compaction (the keyframes that survive;
    identical slot arithmetic to ``map_state.compact_keyframes``).

    When keyframe i is culled, its successor's preintegration window must
    absorb i's window — the reference merges the raw measurement logs
    (``IMU::Preintegrated::MergePrevious``, ``src/ImuTypes.cc:224-335``);
    here consecutive windows are composed in closed form (first-order in
    the bias linearization difference, exact otherwise — ``imu.compose``).
    """
    K = keep.shape[0]
    new_of_old = jnp.where(keep, jnp.cumsum(keep) - 1, K)
    old_of_new = jnp.zeros((K + 1,), jnp.int32).at[new_of_old].set(
        jnp.arange(K, dtype=jnp.int32), mode="drop"
    )
    src = old_of_new[:K]
    mask = jnp.arange(K) < jnp.sum(keep)
    pre_slots = imu_ops.Preintegrated(
        dt=ikf.pre_dt, dR=ikf.pre_dR, dV=ikf.pre_dV, dP=ikf.pre_dP,
        cov=ikf.pre_cov, JRg=ikf.pre_JRg, JVg=ikf.pre_JVg, JVa=ikf.pre_JVa,
        JPg=ikf.pre_JPg, JPa=ikf.pre_JPa, bias_g=ikf.pre_bg0,
        bias_a=ikf.pre_ba0,
    )

    def step(carry, x):
        acc, acc_valid = carry
        pre_i, keep_i, pv_i = x
        total = imu_ops.compose(acc, pre_i)
        # a culled slot's window flows into the accumulator; a kept slot
        # emits the accumulated window and resets the accumulator
        v_total = acc_valid | pv_i
        ident = imu_ops.identity_preintegrated()._replace(
            bias_g=pre_i.bias_g, bias_a=pre_i.bias_a
        )
        carry_next = jax.tree.map(
            lambda t, i2: jnp.where(keep_i, i2, t), total, ident
        )
        return (carry_next, v_total & ~keep_i), (total, v_total)

    init = (imu_ops.identity_preintegrated(), jnp.zeros((), bool))
    _, (merged, merged_valid) = jax.lax.scan(
        step, init, (pre_slots, keep, ikf.pre_valid)
    )
    take = lambda a: jnp.where(
        mask.reshape((K,) + (1,) * (a.ndim - 1)), a[src], jnp.zeros_like(a)
    )
    return InertialKF(
        vel=take(ikf.vel),
        bg=take(ikf.bg),
        ba=take(ikf.ba),
        pre_dt=take(merged.dt),
        pre_dR=jnp.where(mask[:, None, None], merged.dR[src],
                         jnp.eye(3)[None]),
        pre_dV=take(merged.dV),
        pre_dP=take(merged.dP),
        pre_cov=take(merged.cov),
        pre_JRg=take(merged.JRg),
        pre_JVg=take(merged.JVg),
        pre_JVa=take(merged.JVa),
        pre_JPg=take(merged.JPg),
        pre_JPa=take(merged.JPa),
        pre_bg0=take(merged.bias_g),
        pre_ba0=take(merged.bias_a),
        pre_valid=take(merged_valid) & mask,
    )


def edges_for_range(
    ikf: InertialKF, first: int, last: int, cov_floor=vi_ba.COV_FLOOR
) -> vi_ba.InertialEdges:
    """Edges (k-1, k) for k in (first, last], using stored preintegrations.

    Host-side (concrete first/last); info = inv(cov + floor²·I).
    """
    ks = jnp.arange(first + 1, last + 1)
    floor = jnp.diag(jnp.asarray(cov_floor, jnp.float32) ** 2)
    cov = ikf.pre_cov[ks] + floor[None]
    return vi_ba.InertialEdges(
        i=(ks - 1).astype(jnp.int32),
        j=ks.astype(jnp.int32),
        dt=ikf.pre_dt[ks],
        dR=ikf.pre_dR[ks],
        dV=ikf.pre_dV[ks],
        dP=ikf.pre_dP[ks],
        info9=jnp.linalg.inv(cov),
        JRg=ikf.pre_JRg[ks],
        JVg=ikf.pre_JVg[ks],
        JVa=ikf.pre_JVa[ks],
        JPg=ikf.pre_JPg[ks],
        JPa=ikf.pre_JPa[ks],
        bias_g0=ikf.pre_bg0[ks],
        bias_a0=ikf.pre_ba0[ks],
        valid=ikf.pre_valid[ks],
    )


def initialize_imu(
    ms: msx.MapState,
    ikf: InertialKF,
    n_kf: int,
    g0: jnp.ndarray,
    R_cb: jnp.ndarray,
    t_cb: jnp.ndarray,
    estimate_scale: bool = False,
):
    """IMU init over the whole KF chain (InitializeIMU semantics): solve
    gravity/bias/velocities — and, for monocular input, the metric map
    scale (``Optimizer::InertialOptimization`` with VertexScale,
    ``Optimizer.cc:4686``) — with the visual poses fixed, then write the
    result into the inertial KF block.

    Returns (ikf', gravity [3], scale scalar).
    """
    edges = edges_for_range(ikf, 0, n_kf - 1)
    # body poses from camera poses: T_bw = T_bc ∘ T_cw = inv(T_cb) ∘ T_cw
    R_bc, t_bc = lie.se3_inverse(R_cb, t_cb)
    R_bw = jnp.einsum("ij,kjl->kil", R_bc, ms.kf_R_cw[:n_kf])
    t_bw = jnp.einsum("ij,kj->ki", R_bc, ms.kf_t_cw[:n_kf]) + t_bc
    res = vi_init.inertial_optimization(
        R_bw, t_bw, edges, g0, iters=25, prior_g_info=1e2, prior_a_info=1e5,
        estimate_scale=estimate_scale,
    )
    ks = jnp.arange(n_kf)
    ikf = ikf._replace(
        vel=ikf.vel.at[ks].set(res.v),
        bg=ikf.bg.at[ks].set(jnp.broadcast_to(res.bias_g, (n_kf, 3))),
        ba=ikf.ba.at[ks].set(jnp.broadcast_to(res.bias_a, (n_kf, 3))),
    )
    return ikf, res.gravity, res.scale


def build_fiba_problem(ms: msx.MapState, ikf: InertialKF, R_cb, t_cb,
                       rig=None):
    """FullInertialBA problem construction (shared by the single-device
    jitted solve and the obs-sharded distributed one): whole-map masked
    Observations, the consecutive-chain InertialEdges, the body-frame
    VIState and the fixed masks.

    Returns (st, obs, edges, fixed_kf, fixed_point)."""
    K, N = ms.K, ms.N
    kf_col = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, N))
    obs_rows = ms.obs_lm
    feat_ok = ms.kf_feat_valid & (obs_rows >= 0) & ms.kf_valid[:, None]
    inv_s2 = 1.0 / (1.2 ** (2.0 * ms.kf_level.astype(jnp.float32)))
    obs = factors.Observations(
        kf=kf_col.reshape(-1),
        lm=jnp.clip(obs_rows, 0).reshape(-1),
        uv=ms.kf_xy.reshape(-1, 2),
        u_right=ms.kf_ur.reshape(-1),
        inv_sigma2=inv_s2.reshape(-1),
        valid=feat_ok.reshape(-1),
    )
    if rig is not None:
        obs = factors.with_rig_rows(obs, ms.kf_uvr.reshape(-1, 2))
    # consecutive-chain inertial edges over all slots (masked)
    ks = jnp.arange(1, K)
    floor = jnp.diag(jnp.asarray(vi_ba.COV_FLOOR, jnp.float32) ** 2)
    edges = vi_ba.InertialEdges(
        i=(ks - 1).astype(jnp.int32),
        j=ks.astype(jnp.int32),
        dt=ikf.pre_dt[ks],
        dR=ikf.pre_dR[ks],
        dV=ikf.pre_dV[ks],
        dP=ikf.pre_dP[ks],
        info9=jnp.linalg.inv(ikf.pre_cov[ks] + floor[None]),
        JRg=ikf.pre_JRg[ks],
        JVg=ikf.pre_JVg[ks],
        JVa=ikf.pre_JVa[ks],
        JPg=ikf.pre_JPg[ks],
        JPa=ikf.pre_JPa[ks],
        bias_g0=ikf.pre_bg0[ks],
        bias_a0=ikf.pre_ba0[ks],
        valid=ikf.pre_valid[ks] & ms.kf_valid[ks] & ms.kf_valid[ks - 1],
    )
    R_bc, t_bc = lie.se3_inverse(R_cb, t_cb)
    R_bw = jnp.einsum("ij,kjl->kil", R_bc, ms.kf_R_cw)
    t_bw = jnp.einsum("ij,kj->ki", R_bc, ms.kf_t_cw) + t_bc
    st = vi_ba.VIState(R_bw=R_bw, t_bw=t_bw, v=ikf.vel, bg=ikf.bg, ba=ikf.ba)
    fixed_kf = ~ms.kf_valid | (jnp.arange(K) == 0)
    fixed_point = ~ms.lm_valid
    return st, obs, edges, fixed_kf, fixed_point


def apply_fiba_result(ms: msx.MapState, ikf: InertialKF, st_f, X_f,
                      fixed_kf, R_cb, t_cb):
    """Write a VI-BA result back into the map + inertial blocks (free
    keyframes only; fixed slots keep their state)."""
    R_cw_new = jnp.einsum("ij,kjl->kil", R_cb, st_f.R_bw)
    t_cw_new = jnp.einsum("ij,kj->ki", R_cb, st_f.t_bw) + t_cb
    upd = ~fixed_kf
    ms = ms._replace(
        kf_R_cw=jnp.where(upd[:, None, None], R_cw_new, ms.kf_R_cw),
        kf_t_cw=jnp.where(upd[:, None], t_cw_new, ms.kf_t_cw),
        lm_pos=jnp.where(ms.lm_valid[:, None], X_f, ms.lm_pos),
    )
    ikf = ikf._replace(
        vel=jnp.where(upd[:, None], st_f.v, ikf.vel),
        bg=jnp.where(upd[:, None], st_f.bg, ikf.bg),
        ba=jnp.where(upd[:, None], st_f.ba, ikf.ba),
    )
    return ms, ikf


@functools.partial(jax.jit, static_argnames=("iters", "cam_model"))
def full_inertial_ba(
    ms: msx.MapState,
    ikf: InertialKF,
    gravity: jnp.ndarray,
    cam_params: jnp.ndarray,
    R_cb: jnp.ndarray,
    t_cb: jnp.ndarray,
    bf: float,
    prior_bg_info: float = jnp.float32(0.0),
    prior_ba_info: float = jnp.float32(0.0),
    iters: int = 8,
    cam_model: str = "pinhole",
    rig=None,
):
    """Whole-map visual-inertial BA (``Optimizer::FullInertialBA``,
    ``src/Optimizer.cc:397``): reprojection + preintegration chain + bias
    random walks over ALL valid keyframes, matrix-free PCG Schur.

    Two call sites mirror the reference: with bias priors right after IMU
    initialization (bFIBA, ``src/LocalMapping.cc:1712-1720``) and as the
    global BA of inertial maps after loop closure
    (``src/LoopClosing.cc:2287-2289``) — the visual-only GBA used before
    pulled poses off the IMU-consistent trajectory.

    Full-capacity arrays + masks: one compile per session. Returns
    (ms', ikf', cost).
    """
    st, obs, edges, fixed_kf, fixed_point = build_fiba_problem(
        ms, ikf, R_cb, t_cb, rig=rig
    )

    st_f, X_f, costs = vi_ba.vi_bundle_adjust_cg(
        st, ms.lm_pos, obs, edges, fixed_kf, fixed_point, cam_params,
        R_cb, t_cb, bf, gravity,
        gyro_walk_info=vi_ba.WALK_INFO_CAP,
        acc_walk_info=vi_ba.WALK_INFO_CAP,
        prior_bg_info=prior_bg_info,
        prior_ba_info=prior_ba_info,
        iters=iters,
        cam_model=cam_model,
        rig=rig,
    )
    ms, ikf = apply_fiba_result(ms, ikf, st_f, X_f, fixed_kf, R_cb, t_cb)
    return ms, ikf, costs[-1]


@functools.partial(jax.jit, static_argnames=("window", "lm_cap", "iters",
                                              "scale", "cam_model"))
def local_vi_ba_step(
    ms: msx.MapState,
    ikf: InertialKF,
    center_kf: jnp.ndarray,
    gravity: jnp.ndarray,
    cam_params: jnp.ndarray,
    R_cb: jnp.ndarray,
    t_cb: jnp.ndarray,
    bf: float,
    window: int = 10,
    lm_cap: int = 2048,
    iters: int = 6,
    scale: float = 1.2,
    cam_model: str = "pinhole",
    rig=None,
    prior_bg_info=jnp.float32(0.0),
    prior_ba_info=jnp.float32(0.0),
):
    """Sliding-temporal-window local inertial BA (LocalInertialBA analog:
    the reference uses the last 10-25 temporally-consecutive KFs,
    ``Optimizer.cc:3963-3970``), with landmark compaction as in
    ``local_ba_step``. Window = [center-window+1, center].

    With ``window >= n_kf`` and bias priors this IS the whole-map
    FullInertialBA (``Optimizer.cc:397``) in its dense-Schur form — at the
    IMU-init map size (~8-16 KFs) the dense reduced system is ~4.5x faster
    on-chip than the matrix-free PCG whole-capacity solve, so the bFIBA
    call (``LocalMapping.cc:1712-1720``) routes through here.

    Returns (ms, ikf, final_cost).
    """
    K, N, L = ms.K, ms.N, ms.L
    # temporal window (clamped at 0); pad with duplicates marked invalid
    offs = jnp.arange(window - 1, -1, -1)
    win = center_kf - offs  # ascending order, may be negative
    win_ok = (win >= 0) & ms.kf_valid[jnp.clip(win, 0)]
    win = jnp.clip(win, 0)

    # landmark compaction over the window (shared with local_ba_step logic)
    obs_rows = ms.obs_lm[win]
    feat_ok = ms.kf_feat_valid[win] & (obs_rows >= 0) & win_ok[:, None]
    lm_hit = jnp.zeros((L,), bool).at[jnp.clip(obs_rows, 0)].max(
        feat_ok, mode="drop"
    ) & ms.lm_valid
    local_of_global = jnp.where(lm_hit, jnp.cumsum(lm_hit) - 1, lm_cap)
    overflow = local_of_global >= lm_cap
    local_of_global = jnp.where(overflow, lm_cap, local_of_global)
    global_of_local = jnp.full((lm_cap + 1,), 0, jnp.int32).at[
        jnp.clip(local_of_global, 0, lm_cap)
    ].set(jnp.arange(L, dtype=jnp.int32), mode="drop")
    lm_used = jnp.zeros((lm_cap + 1,), bool).at[
        jnp.clip(local_of_global, 0, lm_cap)
    ].set(lm_hit & ~overflow, mode="drop")
    X_local = ms.lm_pos[global_of_local[:lm_cap]]

    lm_local = local_of_global[jnp.clip(obs_rows, 0)]
    obs_valid = feat_ok & (lm_local < lm_cap)
    kf_col = jnp.broadcast_to(
        jnp.arange(window, dtype=jnp.int32)[:, None], (window, N)
    )
    inv_s2 = 1.0 / (scale ** (2.0 * ms.kf_level[win].astype(jnp.float32)))
    obs = factors.Observations(
        kf=kf_col.reshape(-1),
        lm=jnp.clip(lm_local, 0, lm_cap - 1).reshape(-1),
        uv=ms.kf_xy[win].reshape(-1, 2),
        u_right=ms.kf_ur[win].reshape(-1),
        inv_sigma2=inv_s2.reshape(-1),
        valid=obs_valid.reshape(-1),
    )
    if rig is not None:
        obs = factors.with_rig_rows(obs, ms.kf_uvr[win].reshape(-1, 2))

    # inertial edges between consecutive window slots
    ks = win[1:]
    floor = jnp.diag(jnp.asarray(vi_ba.COV_FLOOR, jnp.float32) ** 2)
    edges = vi_ba.InertialEdges(
        i=jnp.arange(window - 1, dtype=jnp.int32),
        j=jnp.arange(1, window, dtype=jnp.int32),
        dt=ikf.pre_dt[ks],
        dR=ikf.pre_dR[ks],
        dV=ikf.pre_dV[ks],
        dP=ikf.pre_dP[ks],
        info9=jnp.linalg.inv(ikf.pre_cov[ks] + floor[None]),
        JRg=ikf.pre_JRg[ks],
        JVg=ikf.pre_JVg[ks],
        JVa=ikf.pre_JVa[ks],
        JPg=ikf.pre_JPg[ks],
        JPa=ikf.pre_JPa[ks],
        bias_g0=ikf.pre_bg0[ks],
        bias_a0=ikf.pre_ba0[ks],
        valid=ikf.pre_valid[ks] & win_ok[1:] & win_ok[:-1],
    )

    # body poses for the window
    R_bc, t_bc = lie.se3_inverse(R_cb, t_cb)
    R_bw = jnp.einsum("ij,kjl->kil", R_bc, ms.kf_R_cw[win])
    t_bw = jnp.einsum("ij,kj->ki", R_bc, ms.kf_t_cw[win]) + t_bc
    st = vi_ba.VIState(
        R_bw=R_bw, t_bw=t_bw,
        v=ikf.vel[win], bg=ikf.bg[win], ba=ikf.ba[win],
    )
    # fix the oldest valid keyframe in the window (temporal anchor)
    first_ok = jnp.argmax(win_ok)  # first True (window ascending in time)
    fixed = (jnp.arange(window) == first_ok) | ~win_ok

    st_f, X_f, costs = vi_ba.vi_bundle_adjust(
        st, X_local, obs, edges, fixed, ~lm_used[:lm_cap], cam_params,
        R_cb, t_cb, bf, gravity,
        gyro_walk_info=vi_ba.WALK_INFO_CAP,
        acc_walk_info=vi_ba.WALK_INFO_CAP,
        prior_bg_info=prior_bg_info,
        prior_ba_info=prior_ba_info,
        iters=iters,
        cam_model=cam_model,
        rig=rig,
    )

    # write back: camera poses T_cw = T_cb ∘ T_bw, inertial states, landmarks
    R_cw_new = jnp.einsum("ij,kjl->kil", R_cb, st_f.R_bw)
    t_cw_new = jnp.einsum("ij,kj->ki", R_cb, st_f.t_bw) + t_cb
    upd = win_ok & ~fixed
    ms = ms._replace(
        kf_R_cw=ms.kf_R_cw.at[win].set(
            jnp.where(upd[:, None, None], R_cw_new, ms.kf_R_cw[win])
        ),
        kf_t_cw=ms.kf_t_cw.at[win].set(
            jnp.where(upd[:, None], t_cw_new, ms.kf_t_cw[win])
        ),
        lm_pos=ms.lm_pos.at[global_of_local[:lm_cap]].set(
            jnp.where(lm_used[:lm_cap, None], X_f, X_local), mode="drop"
        ),
    )
    ikf = ikf._replace(
        vel=ikf.vel.at[win].set(jnp.where(upd[:, None], st_f.v, ikf.vel[win])),
        bg=ikf.bg.at[win].set(jnp.where(upd[:, None], st_f.bg, ikf.bg[win])),
        ba=ikf.ba.at[win].set(jnp.where(upd[:, None], st_f.ba, ikf.ba[win])),
    )
    return ms, ikf, costs[-1]
