"""Long-sequence run: 3000 frames (150 s at 20 fps) of stereo-inertial SLAM
at EuRoC resolution with BOUNDED keyframe capacity.

Exercises the full lifecycle on a MH01-length sequence: KF culling, slot
compaction/eviction, inertial preintegration merge, loop closing. Writes an
EuRoC-format trajectory and scores RMS ATE against ground truth with the
re-implemented evaluate_ate_scale (reference
``evaluation/evaluate_ate_scale.py:50-120``). Real EuRoC is unobtainable in
this environment (zero egress) — this is the documented proxy; see
EUROC_RESULTS.md.

Run (TPU): python tools/run_long_synthetic.py [n_frames]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.config import (
    CameraConfig, CapacityConfig, IMUConfig, ORBConfig, SLAMConfig,
    SensorType, TrackingConfig,
)
from orb_slam3_detailed_comments_kor_tpu.eval import ate
from orb_slam3_detailed_comments_kor_tpu.io import synthetic, trajectory
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

H, W = 480, 752
FX, BASELINE = 458.0, 0.11
FPS, IMU_RATE = 20.0, 200.0


def main(n_frames=3000, out_prefix="/tmp/long_synth"):
    cfg = SLAMConfig(
        sensor=SensorType.IMU_STEREO,
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
    slam = SlamSystem(cfg)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    # slow figure-eight-ish excitation so the camera keeps revisiting the
    # scene over 150 s (AnalyticTrajectory loops with period ~20 s)
    traj = synthetic.AnalyticTrajectory()
    gt = []
    t0 = time.time()
    for i in range(n_frames):
        t = i / FPS
        R_wb, p_wb = traj.pose(t)
        gt.append(np.asarray(p_wb))
        il, ir, _ = synthetic.stereo_pair(
            params, R_wb, p_wb, BASELINE, scene, h=H, w=W
        )
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
        slam.track_stereo_inertial(il, ir, t, samples)
        if (i + 1) % 100 == 0:
            print(f"frame {i + 1}/{n_frames} kf={slam.n_kf} "
                  f"state={slam.state} loops={slam.loop_closer.n_loops_closed} "
                  f"t={time.time() - t0:.0f}s",
                  flush=True)
    slam.flush_decisions()
    jax.block_until_ready(slam.t_cw)
    wall = time.time() - t0
    gt = np.stack(gt)
    ts, centers, R_wc = slam.trajectory_arrays()
    trajectory.save_euroc(out_prefix + "_traj.txt", ts, centers, R_wc)
    n = min(len(centers), len(gt))
    rmse_full = float(ate.ate_rmse(centers[:n], gt[:n]))
    rmse_tail = float(ate.ate_rmse(centers[n - 1000:n], gt[n - 1000:n]))
    result = {
        "n_frames": n_frames,
        "duration_s": n_frames / FPS,
        "wall_s": round(wall, 1),
        "fps": round(n_frames / wall, 2),
        "ate_m": round(rmse_full, 4),
        "ate_last50s_m": round(rmse_tail, 4),
        "state": slam.state,
        "n_kf": slam.n_kf,
        "imu_initialized": bool(slam.imu_initialized),
        "n_loops_closed": slam.loop_closer.n_loops_closed,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))
    with open(out_prefix + "_result.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
