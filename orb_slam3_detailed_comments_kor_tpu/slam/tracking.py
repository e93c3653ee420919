"""Jitted tracking steps: project-match-optimize, keyframe insertion,
windowed local BA, landmark culling.

These are the device-side kernels behind the host state machine in
``system.py``.  Reference counterparts:

- ``track_frame``       ← TrackWithMotionModel + TrackLocalMap
  (``src/Tracking.cc:2817, 2927``): the reference matches last-frame points
  first and local-map points second; on TPU we project the *whole* landmark
  block both times (a batched matmul is cheaper than maintaining local-point
  sets) — stage 1 wide radius at the motion-model pose, stage 2 narrow
  radius at the stage-1 optimum, each followed by motion-only BA.
- ``make_keyframe``     ← Tracking::CreateNewKeyFrame (``Tracking.cc:3275``)
  incl. spawning close stereo MapPoints, and StereoInitialization
  (``Tracking.cc:2236``) when the map is empty.
- ``local_ba_step``     ← LocalMapping's covisibility-window BA
  (``LocalMapping.cc:190`` → ``Optimizer.cc:1637``) with window compaction
  replacing the pointer-chasing local-map assembly.
- ``cull_landmarks``    ← LocalMapping::MapPointCulling (``LocalMapping.cc:421``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.models import camera as cam_mod
from orb_slam3_detailed_comments_kor_tpu.ops import matching, orb as orb_ops
from orb_slam3_detailed_comments_kor_tpu.optim import ba, factors
from orb_slam3_detailed_comments_kor_tpu.slam import map_state as msx
from orb_slam3_detailed_comments_kor_tpu.slam.frontend import Frame
from orb_slam3_detailed_comments_kor_tpu.utils import lie


class TrackResult(NamedTuple):
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    lm_feat: jnp.ndarray     # [L] matched feature idx per landmark (-1)
    lm_inlier: jnp.ndarray   # [L] bool, survived pose optimization
    n_inliers: jnp.ndarray   # scalar
    n_visible: jnp.ndarray   # scalar (landmarks in frustum)


def _project_landmarks(ms, R_cw, t_cw, cam_params, w, h, scale, n_levels,
                       cam_model="pinhole"):
    """Frustum + scale-band visibility for the whole landmark block
    (Frame::isInFrustum analog, ``Frame.h:101``)."""
    pc = ms.lm_pos @ R_cw.T + t_cw
    uv = cam_mod.project(cam_params, pc, cam_model)
    Ow = -R_cw.T @ t_cw
    delta = ms.lm_pos - Ow
    dist = jnp.linalg.norm(delta, axis=-1)
    viewcos = jnp.sum(delta * ms.lm_normal, axis=-1) / jnp.maximum(dist, 1e-6)
    visible = (
        ms.lm_valid
        & (pc[:, 2] > 0.05)
        & (uv[:, 0] >= 0) & (uv[:, 0] < w)
        & (uv[:, 1] >= 0) & (uv[:, 1] < h)
        & (dist >= 0.8 * ms.lm_min_dist)
        & (dist <= 1.3 * ms.lm_max_dist)
        & (viewcos > 0.5)
    )
    level = msx.predict_level(dist, ms.lm_max_dist, scale, n_levels)
    return uv, level, visible


@functools.partial(
    jax.jit,
    static_argnames=(
        "w", "h", "scale", "n_levels", "r_wide", "r_narrow", "track_cap",
        "cam_model", "far_dist",
    ),
)
def track_frame(
    ms: msx.MapState,
    frame: Frame,
    R_pred: jnp.ndarray,
    t_pred: jnp.ndarray,
    cam_params: jnp.ndarray,
    bf: float,
    w: int,
    h: int,
    scale: float = 1.2,
    n_levels: int = 8,
    r_wide: float = 15.0,
    r_narrow: float = 4.0,
    track_cap: int = 4096,
    prior=None,
    cam_model: str = "pinhole",
    rig=None,
    far_dist: float = 0.0,
) -> TrackResult:
    """Two-stage project→match→optimize. One fused device program.

    The visible subset of the landmark block is compacted into a static
    ``track_cap`` window first (the reference's "local map points",
    ``Tracking.cc:3538``): in a mature map only ~1-3k of the L=16k landmark
    slots are in the frustum, and running the matcher + 56 sequential LM
    iterations over [L]-sized arrays made pose optimization the single
    largest per-frame cost (12.9 ms → 5.1 ms at V=4096, measured).
    """
    L = ms.L
    V = track_cap
    uv0, lvl0, vis0 = _project_landmarks(
        ms, R_pred, t_pred, cam_params, w, h, scale, n_levels, cam_model
    )
    if far_dist > 0.0:
        # thFarPoints: drop landmarks beyond the configured depth from the
        # per-frame association (``ORBmatcher.cc:56`` bFarPoints gate fed
        # from ``System.cc:113`` / ``Tracking.cc:3524``) — distant points
        # carry near-zero parallax and only add noise to the pose solve
        pc0 = ms.lm_pos @ R_pred.T + t_pred
        vis0 = vis0 & (pc0[:, 2] <= far_dist)
    # --- compact visible landmarks into V slots (masked static shape) ----
    local = jnp.where(vis0, jnp.cumsum(vis0) - 1, V)
    local = jnp.where(local >= V, V, local)  # overflow → parked
    lm_ids = jnp.arange(L, dtype=jnp.int32)
    sel = jnp.zeros((V + 1,), jnp.int32).at[local].set(lm_ids, mode="drop")
    used = jnp.zeros((V + 1,), bool).at[local].set(vis0, mode="drop")
    sel, used = sel[:V], used[:V]
    X_v = ms.lm_pos[sel]
    bits_v = orb_ops.unpack_descriptors(ms.lm_desc[sel])
    normal_v = ms.lm_normal[sel]
    mind_v = ms.lm_min_dist[sel]
    maxd_v = ms.lm_max_dist[sel]
    inv_sigma2_feat = 1.0 / (scale ** (2.0 * frame.level.astype(jnp.float32)))

    def project_v(R, t):
        """Frustum + scale-band re-check on the compacted window."""
        pc = X_v @ R.T + t
        uv = cam_mod.project(cam_params, pc, cam_model)
        Ow = -R.T @ t
        delta = X_v - Ow
        dist = jnp.linalg.norm(delta, axis=-1)
        viewcos = jnp.sum(delta * normal_v, axis=-1) / jnp.maximum(dist, 1e-6)
        visible = (
            used
            & (pc[:, 2] > 0.05)
            & (uv[:, 0] >= 0) & (uv[:, 0] < w)
            & (uv[:, 1] >= 0) & (uv[:, 1] < h)
            & (dist >= 0.8 * mind_v)
            & (dist <= 1.3 * maxd_v)
            & (viewcos > 0.5)
        )
        level = msx.predict_level(dist, maxd_v, scale, n_levels)
        return uv, level, visible

    def stage(R, t, radius, max_dist, rounds, iters):
        uv, lvl, vis = project_v(R, t)
        res = matching.search_by_projection(
            uv, lvl, bits_v, vis,
            frame.xy, frame.level, frame.desc, frame.valid,
            radius=radius, scale=scale, max_dist=max_dist,
        )
        res = matching.resolve_duplicate_targets(res, frame.n)
        feat = jnp.clip(res.idx, 0)
        opt = ba.pose_optimization(
            R, t, X_v,
            frame.xy[feat],
            frame.u_right[feat],
            inv_sigma2_feat[feat],
            res.valid,
            cam_params, bf,
            rounds=rounds, iters=iters,
            prior=prior, cam_model=cam_model,
            uv_r=None if rig is None else frame.uv_r[feat],
            rig=rig,
        )
        return opt, res, vis

    # TPU latency note: LM iterations are sequential micro-steps, so the
    # (4x10)x2 budget of the reference (Optimizer.cc:831 4 rounds x 10 LM
    # iters, run per stage) is pure latency. The WIDE stage must keep the
    # full 4-round chi2-regating budget: after tracking loss the prediction
    # can be decimetres off and recovery relies on iterate→regate→iterate
    # walking the pose toward consensus (cutting it to 2 rounds made
    # blackout-recovery converge to a spurious pose). The narrow stage
    # starts within a few px, where 2x8 matches 4x10 output.
    opt1, _, _ = stage(R_pred, t_pred, r_wide, matching.TH_HIGH, 4, 10)
    opt2, res2, vis2 = stage(
        opt1.R_cw, opt1.t_cw, r_narrow, matching.TH_HIGH, 2, 8
    )
    # third, ultra-narrow pass (2 px, strict descriptor gate): re-matching
    # at the converged pose stabilizes the inlier SET frame-to-frame —
    # association churn between frames was the dominant per-frame pose
    # jitter (arc-length over-read 10% -> 8%, ATE 17.8 -> 13.9 mm on the
    # synthetic stereo suite). Kept only when it retains the consensus:
    # on noisy geometry (young mono maps, fisheye) the 2 px gate can
    # starve, and stage 2's result is the safer answer.
    opt3, res3, vis3 = stage(
        opt2.R_cw, opt2.t_cw, 2.0, 60, 1, 6
    )
    use3 = (res3.valid & opt3.inlier).sum() >= (
        0.6 * (res2.valid & opt2.inlier).sum()
    )
    opt2 = jax.tree.map(
        lambda a, b: jnp.where(use3, a, b), opt3, opt2
    )
    res2 = jax.tree.map(lambda a, b: jnp.where(use3, a, b), res3, res2)
    vis2 = jnp.where(use3, vis3, vis2)
    inlier_v = res2.valid & opt2.inlier  # [V]
    # --- scatter results back to the [L] landmark block ------------------
    dst = jnp.where(used, sel, L)  # park unused slots out of bounds
    lm_feat = jnp.full((L,), -1, jnp.int32).at[dst].set(
        jnp.where(inlier_v, res2.idx, -1), mode="drop"
    )
    lm_inlier = jnp.zeros((L,), bool).at[dst].set(inlier_v, mode="drop")
    return TrackResult(
        R_cw=opt2.R_cw,
        t_cw=opt2.t_cw,
        lm_feat=lm_feat,
        lm_inlier=lm_inlier,
        n_inliers=jnp.sum(inlier_v),
        n_visible=jnp.sum(vis2),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "bf", "w", "h", "scale", "n_levels", "n_features", "cell",
        "min_inliers", "far_dist",
    ),
    donate_argnums=(0,),
)
def full_frame_step(
    ms: msx.MapState,
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    R_last: jnp.ndarray,
    t_last: jnp.ndarray,
    vel_R: jnp.ndarray,
    vel_t: jnp.ndarray,
    has_vel: jnp.ndarray,
    cam_params: jnp.ndarray,
    bf: float,
    w: int,
    h: int,
    scale: float = 1.2,
    n_levels: int = 8,
    n_features: int = 1200,
    cell: int = 32,
    min_inliers: int = 10,
    far_dist: float = 0.0,
):
    """ONE device program for the whole per-frame hot path: stereo ORB
    front-end + two-stage track + landmark stats + motion-model update.

    The host receives (ms', frame, tr, R, t, vel_R, vel_t, ok) and only needs
    the tr.n_inliers scalar for its state machine — a single dispatch and a
    single scalar sync per frame instead of ~8 dispatches (this is what makes
    the tracking latency target reachable through a remote device tunnel,
    and minimizes launch overhead on a local chip too).
    """
    from orb_slam3_detailed_comments_kor_tpu.slam import frontend as fe

    frame = fe.process_stereo.__wrapped__(
        img_l, img_r, bf, n_features=n_features, n_levels=n_levels,
        scale=scale, cell=cell,
    )
    R_pred0, t_pred0 = lie.se3_compose(vel_R, vel_t, R_last, t_last)
    R_pred = jnp.where(has_vel, R_pred0, R_last)
    t_pred = jnp.where(has_vel, t_pred0, t_last)
    tr = track_frame.__wrapped__(
        ms, frame, R_pred, t_pred, cam_params, bf, w, h, scale, n_levels,
        far_dist=far_dist,
    )
    ok = tr.n_inliers >= min_inliers
    ms = update_landmark_stats(ms, tr)
    # motion model: vel = T_new ∘ inv(T_last); freeze when tracking failed
    Ri, ti = lie.se3_inverse(R_last, t_last)
    vR_new, vt_new = lie.se3_compose(tr.R_cw, tr.t_cw, Ri, ti)
    vel_R = jnp.where(ok, vR_new, vel_R)
    vel_t = jnp.where(ok, vt_new, vel_t)
    R_out = jnp.where(ok, tr.R_cw, R_last)
    t_out = jnp.where(ok, tr.t_cw, t_last)
    return ms, frame, tr, R_out, t_out, vel_R, vel_t, ok


def _finish_step(ms, frame, tr, R_last, t_last, vel_R, vel_t, min_inliers):
    """Shared epilogue of the fused per-frame steps: landmark stats +
    branchless motion-model / pose fallback."""
    ok = tr.n_inliers >= min_inliers
    ms = update_landmark_stats(ms, tr)
    Ri, ti = lie.se3_inverse(R_last, t_last)
    vR_new, vt_new = lie.se3_compose(tr.R_cw, tr.t_cw, Ri, ti)
    vel_R = jnp.where(ok, vR_new, vel_R)
    vel_t = jnp.where(ok, vt_new, vel_t)
    R_out = jnp.where(ok, tr.R_cw, R_last)
    t_out = jnp.where(ok, tr.t_cw, t_last)
    return ms, frame, tr, R_out, t_out, vel_R, vel_t, ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "bf", "w", "h", "scale", "n_levels", "n_features", "cell",
        "min_inliers", "cam_model", "dist", "far_dist",
    ),
    donate_argnums=(0,),
)
def full_mono_step(
    ms: msx.MapState,
    img: jnp.ndarray,
    R_last: jnp.ndarray,
    t_last: jnp.ndarray,
    vel_R: jnp.ndarray,
    vel_t: jnp.ndarray,
    has_vel: jnp.ndarray,
    cam_params: jnp.ndarray,
    prior,
    bf: float = 0.0,
    w: int = 752,
    h: int = 480,
    scale: float = 1.2,
    n_levels: int = 8,
    n_features: int = 1200,
    cell: int = 32,
    min_inliers: int = 10,
    cam_model: str = "pinhole",
    dist=None,
    far_dist: float = 0.0,
):
    """ONE device program for the monocular (and mono-inertial) per-frame
    hot path: mono ORB front-end + three-stage track + stats + motion
    model. ``prior`` is an always-present (R_p, t_p, info_R, info_t)
    tuple — zero infos disable the IMU-predicted pose pull (the fused
    analog of PoseInertialOptimizationLastKeyFrame, ``Optimizer.cc:6697``).
    """
    from orb_slam3_detailed_comments_kor_tpu.slam import frontend as fe

    frame = fe.process_mono.__wrapped__(
        img, n_features=n_features, n_levels=n_levels, scale=scale,
        cell=cell, dist=dist, cam_params=cam_params,
    )
    R_pred0, t_pred0 = lie.se3_compose(vel_R, vel_t, R_last, t_last)
    R_pred = jnp.where(has_vel, R_pred0, R_last)
    t_pred = jnp.where(has_vel, t_pred0, t_last)
    tr = track_frame.__wrapped__(
        ms, frame, R_pred, t_pred, cam_params, bf, w, h, scale, n_levels,
        prior=prior, cam_model=cam_model, far_dist=far_dist,
    )
    return _finish_step(ms, frame, tr, R_last, t_last, vel_R, vel_t,
                        min_inliers)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bf", "w", "h", "scale", "n_levels", "n_features", "cell",
        "min_inliers", "dist", "far_dist",
    ),
    donate_argnums=(0,),
)
def full_rgbd_step(
    ms: msx.MapState,
    img: jnp.ndarray,
    depth_map: jnp.ndarray,
    R_last: jnp.ndarray,
    t_last: jnp.ndarray,
    vel_R: jnp.ndarray,
    vel_t: jnp.ndarray,
    has_vel: jnp.ndarray,
    cam_params: jnp.ndarray,
    bf: float,
    w: int,
    h: int,
    scale: float = 1.2,
    n_levels: int = 8,
    n_features: int = 1200,
    cell: int = 32,
    min_inliers: int = 10,
    dist=None,
    far_dist: float = 0.0,
):
    """Fused RGB-D per-frame step (``Frame.cc:201`` ctor + track)."""
    from orb_slam3_detailed_comments_kor_tpu.slam import frontend as fe

    frame = fe.process_rgbd.__wrapped__(
        img, depth_map, bf, n_features=n_features, n_levels=n_levels,
        scale=scale, cell=cell, dist=dist, cam_params=cam_params,
    )
    R_pred0, t_pred0 = lie.se3_compose(vel_R, vel_t, R_last, t_last)
    R_pred = jnp.where(has_vel, R_pred0, R_last)
    t_pred = jnp.where(has_vel, t_pred0, t_last)
    tr = track_frame.__wrapped__(
        ms, frame, R_pred, t_pred, cam_params, bf, w, h, scale, n_levels,
        far_dist=far_dist,
    )
    return _finish_step(ms, frame, tr, R_last, t_last, vel_R, vel_t,
                        min_inliers)


@functools.partial(
    jax.jit,
    static_argnames=(
        "w", "h", "scale", "n_levels", "n_features", "cell", "min_inliers",
        "far_dist",
    ),
    donate_argnums=(0,),
)
def full_fisheye_step(
    ms: msx.MapState,
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    R_last: jnp.ndarray,
    t_last: jnp.ndarray,
    vel_R: jnp.ndarray,
    vel_t: jnp.ndarray,
    has_vel: jnp.ndarray,
    cam_params: jnp.ndarray,
    cam_params_r: jnp.ndarray,
    R_rl: jnp.ndarray,
    t_rl: jnp.ndarray,
    prior,
    w: int,
    h: int,
    scale: float = 1.2,
    n_levels: int = 8,
    n_features: int = 1200,
    cell: int = 32,
    min_inliers: int = 10,
    far_dist: float = 0.0,
):
    """Fused dual-fisheye (KannalaBrandt8 ×2) per-frame step
    (``Frame.cc:1021`` ctor + track)."""
    from orb_slam3_detailed_comments_kor_tpu.slam import frontend as fe

    frame = fe.process_stereo_fisheye.__wrapped__(
        img_l, img_r, cam_params, cam_params_r, R_rl, t_rl,
        n_features=n_features, n_levels=n_levels, scale=scale, cell=cell,
    )
    R_pred0, t_pred0 = lie.se3_compose(vel_R, vel_t, R_last, t_last)
    R_pred = jnp.where(has_vel, R_pred0, R_last)
    t_pred = jnp.where(has_vel, t_pred0, t_last)
    tr = track_frame.__wrapped__(
        ms, frame, R_pred, t_pred, cam_params, 0.0, w, h, scale, n_levels,
        prior=prior, cam_model="kannala_brandt8",
        rig=(R_rl, t_rl, cam_params_r), far_dist=far_dist,
    )
    return _finish_step(ms, frame, tr, R_last, t_last, vel_R, vel_t,
                        min_inliers)


def update_landmark_stats(
    ms: msx.MapState, tr: TrackResult, visible_mask=None
) -> msx.MapState:
    """found/visible counters (MapPoint::IncreaseFound/Visible)."""
    found = ms.lm_found + tr.lm_inlier.astype(jnp.int32)
    if visible_mask is None:
        visible_mask = tr.lm_inlier
    visible = ms.lm_visible + visible_mask.astype(jnp.int32)
    return ms._replace(lm_found=found, lm_visible=visible)


@functools.partial(jax.jit, static_argnames=("scale", "n_levels",
                                              "cam_model"))
def make_keyframe(
    ms: msx.MapState,
    frame: Frame,
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    time: jnp.ndarray,
    kf_idx: jnp.ndarray,
    lm_feat: jnp.ndarray,
    cam_params: jnp.ndarray,
    depth_far: float,
    scale: float = 1.2,
    n_levels: int = 8,
    cam_model: str = "pinhole",
) -> msx.MapState:
    """Insert a keyframe + spawn stereo landmarks for unmatched close
    features. lm_feat [L] is the tracking association (feature idx or -1)."""
    N = frame.n
    # invert landmark→feature into feature→landmark
    feat_lm = jnp.full((N,), -1, jnp.int32)
    lm_ids = jnp.arange(ms.L, dtype=jnp.int32)
    feat_lm = feat_lm.at[jnp.clip(lm_feat, 0)].set(
        jnp.where(lm_feat >= 0, lm_ids, -1), mode="drop"
    )
    # guard: only keep entries where lm actually matched
    matched_feat = jnp.zeros((N,), bool).at[jnp.clip(lm_feat, 0)].set(
        lm_feat >= 0, mode="drop"
    )
    feat_lm = jnp.where(matched_feat, feat_lm, -1)

    # ---- new landmarks from stereo depth --------------------------------
    # close points always spawn; if fewer than 100 are close, spawn the 100
    # nearest anyway (reference CreateNewKeyFrame takes the sorted-nearest
    # fallback, Tracking.cc:3275 region)
    candidate = frame.valid & (frame.depth > 0.0) & (feat_lm < 0)
    depth_sorted = jnp.sort(jnp.where(candidate, frame.depth, jnp.inf))
    depth_100 = depth_sorted[jnp.minimum(99, N - 1)]
    eff_far = jnp.maximum(depth_far, depth_100 * 1.0001)
    want = candidate & (frame.depth < eff_far)
    slots = msx.allocate_slots(~ms.lm_valid, want)
    got = slots >= 0
    # park non-allocations at index L so mode="drop" discards them (clipping
    # to 0 would make every rejected feature race to overwrite slot 0)
    sl = jnp.where(got, slots, ms.L)

    rays = cam_mod.unproject(cam_params, frame.xy, cam_model)
    pc = rays * frame.depth[:, None]
    R_wc = R_cw.T
    Ow = -R_wc @ t_cw
    Xw = pc @ R_wc.T + Ow
    delta = Xw - Ow
    dist = jnp.linalg.norm(delta, axis=-1)
    normal = delta / jnp.maximum(dist[:, None], 1e-6)
    mind, maxd = msx.landmark_scale_band(dist, frame.level, scale, n_levels)

    ones = jnp.ones((N,), jnp.int32)
    ms = ms._replace(
        lm_pos=ms.lm_pos.at[sl].set(Xw, mode="drop"),
        lm_valid=ms.lm_valid.at[sl].set(True, mode="drop"),
        lm_desc=ms.lm_desc.at[sl].set(frame.desc_packed, mode="drop"),
        lm_normal=ms.lm_normal.at[sl].set(normal, mode="drop"),
        lm_min_dist=ms.lm_min_dist.at[sl].set(mind, mode="drop"),
        lm_max_dist=ms.lm_max_dist.at[sl].set(maxd, mode="drop"),
        lm_found=ms.lm_found.at[sl].set(ones, mode="drop"),
        lm_visible=ms.lm_visible.at[sl].set(ones, mode="drop"),
        lm_first_kf=ms.lm_first_kf.at[sl].set(
            jnp.full((N,), kf_idx, jnp.int32), mode="drop"
        ),
    )
    feat_lm = jnp.where(got, slots, feat_lm)

    # ---- write the keyframe slot ----------------------------------------
    ms = ms._replace(
        kf_R_cw=ms.kf_R_cw.at[kf_idx].set(R_cw),
        kf_t_cw=ms.kf_t_cw.at[kf_idx].set(t_cw),
        kf_valid=ms.kf_valid.at[kf_idx].set(True),
        kf_time=ms.kf_time.at[kf_idx].set(time),
        kf_xy=ms.kf_xy.at[kf_idx].set(frame.xy),
        kf_level=ms.kf_level.at[kf_idx].set(frame.level),
        kf_angle=ms.kf_angle.at[kf_idx].set(frame.angle),
        kf_desc=ms.kf_desc.at[kf_idx].set(frame.desc_packed),
        kf_ur=ms.kf_ur.at[kf_idx].set(frame.u_right),
        kf_uvr=ms.kf_uvr.at[kf_idx].set(
            -jnp.ones((N, 2)) if frame.uv_r is None else frame.uv_r
        ),
        kf_feat_valid=ms.kf_feat_valid.at[kf_idx].set(frame.valid),
        obs_lm=ms.obs_lm.at[kf_idx].set(feat_lm),
    )
    return ms


@functools.partial(
    jax.jit, static_argnames=("window", "lm_cap", "iters", "scale",
                              "cam_model")
)
def local_ba_step(
    ms: msx.MapState,
    center_kf: jnp.ndarray,
    cam_params: jnp.ndarray,
    bf: float,
    window: int = 8,
    lm_cap: int = 4096,
    iters: int = 8,
    scale: float = 1.2,
    cam_model: str = "pinhole",
    rig=None,
) -> msx.MapState:
    """Covisibility-window local BA with landmark compaction.

    Picks the `window` most-covisible keyframes of `center_kf` (plus
    itself), compacts their observed landmarks into a static `lm_cap` block,
    runs Schur-LM BA with the oldest window keyframe fixed, and scatters
    the refined poses/points back into the map.
    """
    K, N, L = ms.K, ms.N, ms.L
    cov = msx.covisibility_weights(ms, center_kf[None])[0]  # [K]
    cov = cov.at[center_kf].set(1 << 20)  # center always first
    cov = jnp.where(ms.kf_valid, cov, -1)
    _, win = jax.lax.top_k(cov, window)  # [W] kf indices (desc covis)
    win_valid = jnp.take(cov, win) > 0

    # fix the oldest valid kf in the window (gauge anchor)
    win_times = jnp.where(win_valid, ms.kf_time[win], jnp.inf)
    anchor = jnp.argmin(win_times)
    fixed_pose = jnp.zeros((window,), bool).at[anchor].set(True)
    fixed_pose = fixed_pose | ~win_valid
    # single-KF maps: everything fixed → no-op BA; guard by freeing center
    n_free = jnp.sum(~fixed_pose)
    fixed_pose = jnp.where(n_free == 0, fixed_pose.at[0].set(False), fixed_pose)

    # ---- landmark window compaction -------------------------------------
    obs_rows = ms.obs_lm[win]              # [W,N]
    feat_ok = ms.kf_feat_valid[win] & (obs_rows >= 0) & win_valid[:, None]
    lm_hit = jnp.zeros((L,), bool).at[jnp.clip(obs_rows, 0)].max(
        feat_ok, mode="drop"
    )
    lm_hit = lm_hit & ms.lm_valid
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

    # ---- flat observation table -----------------------------------------
    lm_local = local_of_global[jnp.clip(obs_rows, 0)]  # [W,N]
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
        # rig right-camera rows: one extra mono residual per matched
        # feature through the extrinsic (OptimizableTypes.h ToBody edges)
        obs = factors.with_rig_rows(obs, ms.kf_uvr[win].reshape(-1, 2))
    res = ba.bundle_adjust(
        ms.kf_R_cw[win],
        ms.kf_t_cw[win],
        X_local,
        obs,
        fixed_pose,
        ~lm_used[:lm_cap],
        cam_params,
        bf,
        iters=iters,
        cam_model=cam_model,
        rig=rig,
    )

    # ---- scatter back ----------------------------------------------------
    upd_pose = win_valid & ~fixed_pose
    ms = ms._replace(
        kf_R_cw=ms.kf_R_cw.at[win].set(
            jnp.where(upd_pose[:, None, None], res.R_cw, ms.kf_R_cw[win])
        ),
        kf_t_cw=ms.kf_t_cw.at[win].set(
            jnp.where(upd_pose[:, None], res.t_cw, ms.kf_t_cw[win])
        ),
        lm_pos=ms.lm_pos.at[global_of_local[:lm_cap]].set(
            jnp.where(lm_used[:lm_cap, None], res.X, X_local), mode="drop"
        ),
    )
    # Drop observations BA marked as clear outliers. Two safeguards vs the
    # reference's strict post-BA chi2 erase (Optimizer.cc LocalBA epilogue):
    # (1) only drop at 4x the chi2 gate — our fixed-iteration f32 LM may not
    #     have fully converged, and a strict gate can erase inliers;
    # (2) never let a keyframe drop below a survival floor of observations
    #     (an obs-less keyframe floats free and corrupts later windows).
    delta2 = jnp.where(obs.u_right >= 0, 7.815, 5.991)
    egregious = obs.valid & (res.chi2 > 4.0 * delta2)
    if rig is not None:
        # drop decisions are per left-frame feature slot; a wild right-row
        # alone is not grounds to erase the (left) observation
        egregious = egregious[: window * N]
    egregious2d = egregious.reshape(window, N)
    would_keep = jnp.sum(
        (obs.valid[: window * N].reshape(window, N) & ~egregious2d), axis=1
    )
    allow_drop = (would_keep >= 30)[:, None]
    new_rows = jnp.where(egregious2d & allow_drop, -1, obs_rows)
    ms = ms._replace(obs_lm=ms.obs_lm.at[win].set(
        jnp.where(win_valid[:, None], new_rows, obs_rows)
    ))
    return ms


@functools.partial(jax.jit, static_argnames=("scale", "n_levels"))
def add_triangulated_landmarks(
    ms: msx.MapState,
    kf_a: jnp.ndarray,
    kf_b: jnp.ndarray,
    feat_b: jnp.ndarray,
    X_w: jnp.ndarray,
    want: jnp.ndarray,
    cam_params: jnp.ndarray,
    scale: float = 1.2,
    n_levels: int = 8,
) -> msx.MapState:
    """Create landmarks from triangulated pairs between two keyframes.

    Arrays are indexed by kf_a's feature slots: feat_b [N] matching feature
    in kf_b (−1 none), X_w [N,3] world positions, want [N] gate mask.
    kf_b may be a scalar (two-view init) or a per-feature [N] array (the
    multi-neighbour mapping-time triangulation).
    Used by monocular initialization and by mapping-time triangulation
    (LocalMapping::CreateNewMapPoints, ``LocalMapping.cc:492``).
    """
    N = ms.N
    kf_b = jnp.broadcast_to(jnp.asarray(kf_b, jnp.int32), feat_b.shape)
    slots = msx.allocate_slots(~ms.lm_valid, want)
    got = slots >= 0
    sl = jnp.where(got, slots, ms.L)

    R_a = ms.kf_R_cw[kf_a]
    t_a = ms.kf_t_cw[kf_a]
    Ow = -R_a.T @ t_a
    delta = X_w - Ow
    dist = jnp.linalg.norm(delta, axis=-1)
    normal = delta / jnp.maximum(dist[:, None], 1e-6)
    lvl = ms.kf_level[kf_a]
    mind, maxd = msx.landmark_scale_band(dist, lvl, scale, n_levels)
    desc = ms.kf_desc[kf_a]

    ones = jnp.ones((N,), jnp.int32)
    ms = ms._replace(
        lm_pos=ms.lm_pos.at[sl].set(X_w, mode="drop"),
        lm_valid=ms.lm_valid.at[sl].set(True, mode="drop"),
        lm_desc=ms.lm_desc.at[sl].set(desc, mode="drop"),
        lm_normal=ms.lm_normal.at[sl].set(normal, mode="drop"),
        lm_min_dist=ms.lm_min_dist.at[sl].set(mind, mode="drop"),
        lm_max_dist=ms.lm_max_dist.at[sl].set(maxd, mode="drop"),
        lm_found=ms.lm_found.at[sl].set(ones * 2, mode="drop"),
        lm_visible=ms.lm_visible.at[sl].set(ones * 2, mode="drop"),
        lm_first_kf=ms.lm_first_kf.at[sl].set(
            jnp.full((N,), kf_a, jnp.int32), mode="drop"
        ),
    )
    # obs rows: kf_a at its own feature slots; each feature's chosen
    # neighbour at the matched slot (2-D scatter; invalids park off-range)
    row_a = jnp.where(got, slots, ms.obs_lm[kf_a])
    ms = ms._replace(obs_lm=ms.obs_lm.at[kf_a].set(row_a))
    ok_b = got & (feat_b >= 0) & (kf_b >= 0)
    nbv = jnp.where(ok_b, kf_b, ms.K)
    fbv = jnp.where(ok_b, feat_b, N)
    ms = ms._replace(
        obs_lm=ms.obs_lm.at[nbv, fbv].set(slots, mode="drop")
    )
    return ms


@functools.partial(jax.jit, static_argnames=("scale", "n_levels", "w", "h",
                                              "cam_model", "n_neighbors",
                                              "far_dist"))
def triangulate_with_neighbor(
    ms: msx.MapState,
    kf_idx: jnp.ndarray,
    cam_params: jnp.ndarray,
    w: int,
    h: int,
    scale: float = 1.2,
    n_levels: int = 8,
    max_reproj_px: float = 2.0,
    min_parallax_cos: float = 0.99998,
    cam_model: str = "pinhole",
    n_neighbors: int = 5,
    far_dist: float = 0.0,
):
    """Mapping-time triangulation of a keyframe's unmatched features against
    its ``n_neighbors`` most covisible keyframes
    (``LocalMapping::CreateNewMapPoints``, ``src/LocalMapping.cc:492-954``
    loops ~20 covisible KFs; ``SearchForTriangulation``,
    ``src/ORBmatcher.cc:965``). Each feature keeps the candidate with the
    strongest parallax among the neighbours that pass the gates — mono map
    density no longer depends on a single baseline.

    Returns (feat_b [N], X_w [N,3], want [N], nb_of_feat [N]) where
    nb_of_feat is the per-feature chosen neighbour keyframe index.
    """
    from orb_slam3_detailed_comments_kor_tpu.models import camera as cm
    from orb_slam3_detailed_comments_kor_tpu.ops import twoview

    N = ms.N
    cov = msx.covisibility_weights(ms, kf_idx[None])[0]
    cov = cov.at[kf_idx].set(-1)
    cov = jnp.where(ms.kf_valid, cov, -1)
    _, nbs = jax.lax.top_k(cov, n_neighbors)  # [Nb]
    nb_ok = jnp.take(cov, nbs) > 0

    da = orb_ops.unpack_descriptors(ms.kf_desc[kf_idx])
    va = ms.kf_feat_valid[kf_idx] & (ms.obs_lm[kf_idx] < 0)
    rays_a = cm.unproject(cam_params, ms.kf_xy[kf_idx], cam_model)
    Ra, ta = ms.kf_R_cw[kf_idx], ms.kf_t_cw[kf_idx]
    Rai, tai = lie.se3_inverse(Ra, ta)
    sigma_a = scale ** ms.kf_level[kf_idx].astype(jnp.float32)

    def per_neighbor(nb, ok):
        db = orb_ops.unpack_descriptors(ms.kf_desc[nb])
        vb = ms.kf_feat_valid[nb] & (ms.obs_lm[nb] < 0) & ok
        res = matching.match_nn_ratio(da, db, va, vb, max_dist=50, ratio=0.8)
        fb = jnp.clip(res.idx, 0)
        rays_b = cm.unproject(cam_params, ms.kf_xy[nb], cam_model)[fb]
        Rb, tb = ms.kf_R_cw[nb], ms.kf_t_cw[nb]
        R_ba, t_ba = lie.se3_compose(Rb, tb, Rai, tai)
        X_a, dep_a, dep_b = twoview.triangulate_midpoint(
            R_ba, t_ba, rays_a, rays_b
        )
        uv_a = cm.project(cam_params, X_a, cam_model)
        X_b = X_a @ R_ba.T + t_ba
        uv_b = cm.project(cam_params, X_b, cam_model)
        err_a = jnp.linalg.norm(uv_a - ms.kf_xy[kf_idx], axis=-1)
        err_b = jnp.linalg.norm(uv_b - ms.kf_xy[nb, fb], axis=-1)
        ob = -R_ba.T @ t_ba
        v1 = X_a / jnp.maximum(
            jnp.linalg.norm(X_a, axis=-1, keepdims=True), 1e-9
        )
        v2 = X_a - ob
        v2 = v2 / jnp.maximum(
            jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-9
        )
        cospar = jnp.sum(v1 * v2, axis=-1)
        good = (
            res.valid & ok
            & (dep_a > 0.05) & (dep_b > 0.05)
            & (err_a < max_reproj_px * sigma_a)
            & (err_b < max_reproj_px * sigma_a)
            & (cospar < min_parallax_cos)
        )
        if far_dist > 0.0:
            # thFarPoints triangulation gate (``LocalMapping.cc:923``):
            # don't create landmarks beyond the configured depth
            good = good & (dep_a < far_dist) & (dep_b < far_dist)
        return jnp.where(res.valid, res.idx, -1), X_a, good, cospar

    feat_b_n, X_a_n, good_n, cospar_n = jax.vmap(per_neighbor)(nbs, nb_ok)

    # per feature: keep the passing neighbour with the LOWEST cos-parallax
    # (strongest baseline — best-conditioned triangulation)
    key = jnp.where(good_n, cospar_n, jnp.inf)   # [Nb,N]
    pick = jnp.argmin(key, axis=0)               # [N]
    rows = jnp.arange(N)
    want = jnp.take_along_axis(good_n, pick[None, :], axis=0)[0]
    feat_b = jnp.where(
        want, feat_b_n[pick, rows], -1
    )
    X_a_sel = X_a_n[pick, rows]
    nb_of_feat = jnp.where(want, nbs[pick], -1)

    # world coordinates
    X_w = X_a_sel @ Rai.T + tai
    return feat_b, X_w, want, nb_of_feat


@jax.jit
def cull_landmarks(ms: msx.MapState) -> msx.MapState:
    """Found-ratio culling (LocalMapping::MapPointCulling semantics) plus
    orphan collection.

    Orphans: a landmark with ZERO surviving keyframe observations — its
    observers were all culled/evicted — can never be optimized or culled
    by the ratio test again, so it would leak its pool slot forever (the
    reference deletes such points when the last observation is erased,
    ``MapPoint::EraseObservation`` → ``SetBadFlag``, ``MapPoint.cc:219``).
    Over a long sequence with keyframe churn this leak saturated the
    landmark pool (~16k slots in ~95 s) and starved new-landmark spawning,
    collapsing tracking — found in the 3000-frame lifecycle run.

    Observation rows pointing at a culled landmark are cleared too: the
    freed slot is recycled by the next allocation, and a stale obs entry
    would silently alias the new landmark."""
    ratio = ms.lm_found / jnp.maximum(ms.lm_visible, 1)
    bad = ms.lm_valid & (ms.lm_visible >= 4) & (ratio < 0.25)
    obs_ok = (ms.obs_lm >= 0) & ms.kf_feat_valid & ms.kf_valid[:, None]
    n_obs = jnp.zeros((ms.L,), jnp.int32).at[jnp.clip(ms.obs_lm, 0)].add(
        obs_ok.astype(jnp.int32), mode="drop"
    )
    bad = bad | (ms.lm_valid & (n_obs == 0))
    stale = bad[jnp.clip(ms.obs_lm, 0)] & (ms.obs_lm >= 0)
    return ms._replace(
        lm_valid=ms.lm_valid & ~bad,
        obs_lm=jnp.where(stale, -1, ms.obs_lm),
    )


@functools.partial(jax.jit, static_argnames=("max_cull",))
def cull_redundant_keyframes(
    ms: msx.MapState,
    protect: jnp.ndarray,
    max_cull: int = 1,
    redundancy: float = 0.9,
) -> msx.MapState:
    """Redundant-keyframe culling (LocalMapping::KeyFrameCulling,
    ``LocalMapping.cc:1194``): a keyframe whose landmarks are ≥90% observed
    by ≥3 other keyframes is removed (marked invalid, observations cleared).

    protect [K] bool: keyframes that must never be culled (anchors, the
    newest ones, the inertial temporal chain). Up to ``max_cull`` keyframes
    are removed per call; the observer counts are recomputed after each
    removal so cascades stay sound (the reference rescans its whole local
    window per mapping step).
    """
    K, N, L = ms.K, ms.N, ms.L

    def one(carry, _):
        kf_valid, obs_lm = carry
        ok = (obs_lm >= 0) & ms.kf_feat_valid & kf_valid[:, None]
        n_obs = jnp.zeros((L,), jnp.int32).at[jnp.clip(obs_lm, 0)].add(
            ok.astype(jnp.int32), mode="drop"
        )
        well_observed = n_obs[jnp.clip(obs_lm, 0)] >= 4  # self + 3 others
        red = jnp.sum(well_observed & ok, axis=1)
        tot = jnp.maximum(jnp.sum(ok, axis=1), 1)
        redundant = (
            kf_valid & ~protect
            & (red.astype(jnp.float32) / tot > redundancy)
        )
        first = jnp.argmax(redundant)
        do = jnp.any(redundant)
        kf_valid = kf_valid.at[first].set(
            jnp.where(do, False, kf_valid[first])
        )
        obs_lm = obs_lm.at[first].set(
            jnp.where(do, -jnp.ones((N,), jnp.int32), obs_lm[first])
        )
        return (kf_valid, obs_lm), None

    (kf_valid, obs_lm), _ = jax.lax.scan(
        one, (ms.kf_valid, ms.obs_lm), None, length=max_cull
    )
    return ms._replace(kf_valid=kf_valid, obs_lm=obs_lm)
