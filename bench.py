"""Benchmark: tracked frames/s + frame-latency percentiles on one TPU chip,
EuRoC-like workload.

Measurements, all at EuRoC resolution (480x752, 1200 ORB features, 20 fps
sensor rate):
- stereo (visual only) throughput: the round-1 headline metric
- stereo-inertial throughput: the flagship mode (reference
  stereo_inertial_euroc) — IMU queueing + preintegration + predicted-pose
  tracking included
- per-frame latency p50/p99 for both modes: a separate pass that blocks on
  each frame's pose before feeding the next (the real-time question the
  reference answers with its LocalMapping thread overlap,
  ``src/System.cc:104-148``) — KF insertions and background BA slices
  included. Sensor period is 50 ms; p99 <= 50 ms means no frame ever waits
  behind mapping work.

Baseline: the reference tracks at sensor rate (20 fps EuRoC) on a desktop
i7 (BASELINE.md); vs_baseline = fps / 20.0, target >= 2.0 for both.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...,
"si_fps", "si_vs_baseline", "si_ate_m", "si_state",
"p50_ms", "p99_ms", "si_p50_ms", "si_p99_ms"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 480, 752
FX, BASELINE = 458.0, 0.11
FPS = 20.0
IMU_RATE = 200.0
N_FRAMES = 130


def build_config(inertial: bool):
    from orb_slam3_detailed_comments_kor_tpu.config import (
        CameraConfig, CapacityConfig, IMUConfig, ORBConfig, SLAMConfig,
        SensorType, TrackingConfig,
    )

    return SLAMConfig(
        sensor=SensorType.IMU_STEREO if inertial else SensorType.STEREO,
        camera=CameraConfig(
            width=W, height=H, fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
            bf=BASELINE * FX,
        ),
        orb=ORBConfig(n_features=1200, cell_size=32),
        imu=IMUConfig(frequency=IMU_RATE),
        capacity=CapacityConfig(
            max_keyframes=64, max_landmarks=16384, max_local_landmarks=4096
        ),
        tracking=TrackingConfig(max_frames_between_kf=10),
    )


def _latency_pass(cfg, feed):
    """Per-frame latency: block on the frame's pose before feeding the
    next (all programs already compiled by the warm pass). Returns
    (p50_ms, p99_ms)."""
    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

    slam = SlamSystem(cfg)
    lat = []
    for i in range(N_FRAMES):
        t0 = time.perf_counter()
        feed(slam, i)
        jax.block_until_ready(slam.t_cw)
        lat.append((time.perf_counter() - t0) * 1e3)
    # drop the bootstrap frames (map init dominates, not steady state)
    lat = np.array(lat[5:])
    return float(np.percentile(lat, 50)), float(np.percentile(lat, 99))


def bench_stereo(frames, ts):
    from orb_slam3_detailed_comments_kor_tpu.eval import ate
    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

    cfg = build_config(False)
    # pass 1 (throwaway system) drives every jit-compiling code path so the
    # timed pass hits only the in-process executable cache
    warm = SlamSystem(cfg)
    for i in range(N_FRAMES):
        warm.track_stereo(frames[i][0], frames[i][1], i / FPS)
    warm.flush_decisions()
    jax.block_until_ready(warm.t_cw)
    del warm

    slam = SlamSystem(cfg)
    t0 = time.time()
    for i in range(N_FRAMES):
        slam.track_stereo(frames[i][0], frames[i][1], i / FPS)
    jax.block_until_ready(slam.t_cw)
    wall = time.time() - t0
    _, centers, _ = slam.trajectory_arrays()
    rmse = ate.ate_rmse(centers, ts[: len(centers)])
    p50, p99 = _latency_pass(
        cfg, lambda s, i: s.track_stereo(frames[i][0], frames[i][1], i / FPS)
    )
    return N_FRAMES / wall, float(rmse), slam.state, p50, p99


def bench_stereo_inertial(frames, imu_per_frame, gt_pos):
    from orb_slam3_detailed_comments_kor_tpu.eval import ate
    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

    cfg = build_config(True)

    def run(system):
        for i in range(N_FRAMES):
            system.track_stereo_inertial(
                frames[i][0], frames[i][1], i / FPS, imu_per_frame[i]
            )
        return system

    warm = run(SlamSystem(cfg))
    warm.flush_decisions()
    jax.block_until_ready(warm.t_cw)
    del warm

    slam = SlamSystem(cfg)
    t0 = time.time()
    run(slam)
    jax.block_until_ready(slam.t_cw)
    wall = time.time() - t0
    _, centers, _ = slam.trajectory_arrays()
    rmse = ate.ate_rmse(centers, gt_pos[: len(centers)])
    p50, p99 = _latency_pass(
        cfg,
        lambda s, i: s.track_stereo_inertial(
            frames[i][0], frames[i][1], i / FPS, imu_per_frame[i]
        ),
    )
    return N_FRAMES / wall, float(rmse), slam.state, p50, p99


N_LOOP = 150
INJECT_AT = 80


def _inject_drift(slam, mag=0.35, yaw=0.03):
    """Warp the newest third of the map + the live pose by a rigid drift D
    — the state a long drifting circuit produces (the recipe of
    tests/test_loop_injected.py applied mid-run). Late keyframes'
    observations of EARLY landmarks are cleared so the drifted submap is
    self-consistent and covisibility-disconnected from the early map; the
    return leg then re-maps the revisited region in the drifted frame and
    loop detection → Sim3 verification → correction → chunked GBA all fire
    NATURALLY inside the blocking pass. (A zero-drift synthetic revisit is
    not a loop at all: the tracker just re-matches the old landmarks and
    stays covisibility-connected, which the candidate search rightly
    excludes — ``KeyFrameDatabase.cc:228`` spConnectedKF; that is why the
    r4 outback pass closed zero loops.)"""
    from orb_slam3_detailed_comments_kor_tpu.utils import lie

    ms = slam.ms
    cut = 2 * slam.n_kf // 3
    K = ms.K
    R_d, t_d = lie.se3_exp(
        jnp.array([0.0, yaw, 0.0, mag * 0.7, mag * 0.7, 0.0])
    )
    Rd_i, td_i = lie.se3_inverse(R_d, t_d)
    late_kf = jnp.arange(K) >= cut
    R_new, t_new = lie.se3_compose(
        ms.kf_R_cw, ms.kf_t_cw,
        jnp.broadcast_to(Rd_i, (K, 3, 3)), jnp.broadcast_to(td_i, (K, 3)),
    )
    late_lm = ms.lm_valid & (ms.lm_first_kf >= cut)
    X_new = ms.lm_pos @ R_d.T + t_d
    early_lm_obs = (ms.obs_lm >= 0) & (
        ms.lm_first_kf[jnp.clip(ms.obs_lm, 0)] < cut
    )
    clear = late_kf[:, None] & early_lm_obs
    slam.ms = ms._replace(
        kf_R_cw=jnp.where(late_kf[:, None, None], R_new, ms.kf_R_cw),
        kf_t_cw=jnp.where(late_kf[:, None], t_new, ms.kf_t_cw),
        lm_pos=jnp.where(late_lm[:, None], X_new, ms.lm_pos),
        obs_lm=jnp.where(clear, -1, ms.obs_lm),
    )
    slam.R_cw, slam.t_cw = lie.se3_compose(slam.R_cw, slam.t_cw, Rd_i, td_i)
    slam.has_velocity = False


def bench_loop_latency():
    """Latency pass that CONTAINS a real loop closure (VERDICT r3 #9 /
    r4 #4): out-and-back with a drift injection at the turn; detection,
    verification, correction and the chunked GBA all ride the background
    queue inside the blocking pass and show up in the percentiles."""
    from orb_slam3_detailed_comments_kor_tpu.io import synthetic
    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

    cfg = build_config(False)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    Rs, ts = synthetic.make_trajectory(N_LOOP, motion="outback", speed=0.045)
    frames = []
    for i in range(N_LOOP):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        frames.append((il.block_until_ready(), ir.block_until_ready()))

    def run(slam, lat=None):
        for i in range(N_LOOP):
            if i == INJECT_AT:
                slam.flush_decisions()
                _inject_drift(slam)
            t0 = time.perf_counter()
            slam.track_stereo(frames[i][0], frames[i][1], i / FPS)
            if lat is not None:
                jax.block_until_ready(slam.t_cw)
                lat.append((time.perf_counter() - t0) * 1e3)
        return slam

    # warm pass runs the SAME injection so detection/correction/GBA
    # programs are compiled before the timed pass
    warm = run(SlamSystem(cfg))
    warm.flush_decisions()
    jax.block_until_ready(warm.t_cw)
    del warm

    slam = SlamSystem(cfg)
    lat = []
    run(slam, lat)
    loops = slam.loop_closer.n_loops_closed
    lat = np.array(lat[5:])
    return (
        float(np.percentile(lat, 50)), float(np.percentile(lat, 99)),
        int(loops),
    )


def bench_default_capacity(frames, ts):
    """Stereo pass at the PRODUCTION capacity config (512 KF / 32,768
    landmarks — `CapacityConfig()` defaults; the plain benches use the
    64-KF bench scale). Exercises the full-capacity program shapes the
    default config actually compiles to."""
    import dataclasses

    from orb_slam3_detailed_comments_kor_tpu.config import CapacityConfig
    from orb_slam3_detailed_comments_kor_tpu.eval import ate
    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

    cfg = dataclasses.replace(build_config(False), capacity=CapacityConfig())
    warm = SlamSystem(cfg)
    for i in range(N_FRAMES):
        warm.track_stereo(frames[i][0], frames[i][1], i / FPS)
    warm.flush_decisions()
    jax.block_until_ready(warm.t_cw)
    del warm

    slam = SlamSystem(cfg)
    t0 = time.time()
    for i in range(N_FRAMES):
        slam.track_stereo(frames[i][0], frames[i][1], i / FPS)
    jax.block_until_ready(slam.t_cw)
    wall = time.time() - t0
    _, centers, _ = slam.trajectory_arrays()
    rmse = ate.ate_rmse(centers, ts[: len(centers)])
    p50, p99 = _latency_pass(
        cfg, lambda s, i: s.track_stereo(frames[i][0], frames[i][1], i / FPS)
    )
    return N_FRAMES / wall, float(rmse), p50, p99


def main():
    from orb_slam3_detailed_comments_kor_tpu.io import synthetic

    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()

    # ---- stereo workload (pre-rendered; rendering is not benchmarked) ----
    Rs, ts = synthetic.make_trajectory(N_FRAMES, motion="strafe", speed=0.03)
    frames_v = []
    for i in range(N_FRAMES):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        frames_v.append((il.block_until_ready(), ir.block_until_ready()))
    bench_t0 = time.time()
    fps_v, ate_v, state_v, p50_v, p99_v = bench_stereo(frames_v, ts)
    # auxiliary segments must never take the headline metrics down (and
    # self-skip if compiles already ate the time budget)
    try:
        assert time.time() - bench_t0 < 1500
        fps_dc, ate_dc, p50_dc, p99_dc = bench_default_capacity(frames_v, ts)
    except Exception:
        fps_dc, ate_dc, p50_dc, p99_dc = -1.0, -1.0, -1.0, -1.0
    del frames_v
    try:
        assert time.time() - bench_t0 < 2100
        loop_p50, loop_p99, n_loops = bench_loop_latency()
    except Exception:
        loop_p50, loop_p99, n_loops = -1.0, -1.0, -1

    # ---- stereo-inertial workload ---------------------------------------
    traj = synthetic.AnalyticTrajectory()
    frames_i, imu_pf, gt_pos = [], [], []
    for i in range(N_FRAMES):
        t = i / FPS
        R_wb, p_wb = traj.pose(t)
        gt_pos.append(np.asarray(p_wb))
        il, ir, _ = synthetic.stereo_pair(
            params, R_wb, p_wb, BASELINE, scene, h=H, w=W
        )
        frames_i.append((il.block_until_ready(), ir.block_until_ready()))
        samples = []
        if i > 0:
            t0s = (i - 1) / FPS
            n = int(round((t - t0s) * IMU_RATE))
            dt = (t - t0s) / n
            for k in range(n):
                tm = t0s + (k + 0.5) * dt
                acc, gyro = traj.imu_at(tm)
                samples.append(
                    (t0s + (k + 1) * dt, np.asarray(acc), np.asarray(gyro))
                )
        imu_pf.append(samples)
    gt_pos = np.stack(gt_pos)
    fps_i, ate_i, state_i, p50_i, p99_i = bench_stereo_inertial(
        frames_i, imu_pf, gt_pos
    )

    ok_v = state_v == 1 and ate_v < 0.15
    ok_i = state_i == 1 and ate_i < 0.15
    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_second_1chip",
                "value": round(fps_v, 2) if ok_v else 0.0,
                "unit": "fps",
                "vs_baseline": round(fps_v / 20.0, 3) if ok_v else 0.0,
                "ate_m": round(ate_v, 4),
                "state": state_v,
                "si_fps": round(fps_i, 2) if ok_i else 0.0,
                "si_vs_baseline": round(fps_i / 20.0, 3) if ok_i else 0.0,
                "si_ate_m": round(ate_i, 4),
                "si_state": state_i,
                "p50_ms": round(p50_v, 1),
                "p99_ms": round(p99_v, 1),
                "si_p50_ms": round(p50_i, 1),
                "si_p99_ms": round(p99_i, 1),
                "loop_p50_ms": round(loop_p50, 1),
                "loop_p99_ms": round(loop_p99, 1),
                "loops_closed_in_latency_pass": n_loops,
                "defcap_fps": round(fps_dc, 2),
                "defcap_ate_m": round(ate_dc, 4),
                "defcap_p50_ms": round(p50_dc, 1),
                "defcap_p99_ms": round(p99_dc, 1),
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
