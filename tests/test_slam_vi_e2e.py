"""End-to-end stereo-inertial SLAM on a synthetic sequence: the flagship
mode (reference stereo_inertial_euroc). Verifies IMU initialization fires,
gravity is recovered, and ATE stays centimetric."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.config import (
    CameraConfig, CapacityConfig, IMUConfig, ORBConfig, SLAMConfig,
    SensorType, TrackingConfig,
)
from orb_slam3_detailed_comments_kor_tpu.eval import ate
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem, TrackingState

H, W = 240, 376
FX = 230.0
BASELINE = 0.11
FPS = 20.0
IMU_RATE = 200.0


def vi_config() -> SLAMConfig:
    return SLAMConfig(
        sensor=SensorType.IMU_STEREO,
        camera=CameraConfig(
            width=W, height=H, fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
            bf=BASELINE * FX,
        ),
        orb=ORBConfig(n_features=600, cell_size=24),
        imu=IMUConfig(frequency=IMU_RATE),
        capacity=CapacityConfig(
            max_keyframes=32, max_landmarks=4096, max_local_landmarks=2048,
        ),
        tracking=TrackingConfig(max_frames_between_kf=8),
    )


def run_vi_sequence(n_frames=110):
    cfg = vi_config()
    slam = SlamSystem(cfg)
    traj = synthetic.AnalyticTrajectory()
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    gt_pos = []
    for i in range(n_frames):
        t = i / FPS
        R_wb, p_wb = traj.pose(t)
        gt_pos.append(np.asarray(p_wb))
        img_l, img_r, _ = synthetic.stereo_pair(
            params, R_wb, p_wb, BASELINE, scene, h=H, w=W
        )
        # IMU samples since previous frame (midpoint sampling)
        samples = []
        if i > 0:
            t0 = (i - 1) / FPS
            n = int(round((t - t0) * IMU_RATE))
            dt = (t - t0) / n
            for k in range(n):
                ts = t0 + (k + 0.5) * dt
                acc, gyro = traj.imu_at(ts)
                samples.append((t0 + (k + 1) * dt, np.asarray(acc), np.asarray(gyro)))
        slam.track_stereo_inertial(img_l, img_r, t, samples)
    return slam, np.stack(gt_pos)


class TestStereoInertial:
    @pytest.fixture(scope="class")
    def run(self):
        return run_vi_sequence()

    def test_tracking_ok(self, run):
        slam, _ = run
        assert slam.state == TrackingState.OK

    def test_imu_initialized(self, run):
        slam, _ = run
        assert slam.imu_initialized

    def test_gravity_recovered(self, run):
        slam, _ = run
        g = np.asarray(slam.gravity)
        cos = g @ np.array([0.0, 9.81, 0.0]) / (np.linalg.norm(g) * 9.81)
        ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert ang < 4.0, (g, ang)

    def test_ate(self, run):
        slam, gt_pos = run
        _, centers, _ = slam.trajectory_arrays()
        rmse = ate.ate_rmse(centers, gt_pos[: len(centers)])
        assert rmse < 0.05, f"ATE {rmse*1000:.1f}mm"

    def test_bias_near_zero(self, run):
        # synthetic IMU has zero bias; estimates must stay small
        slam, _ = run
        kf = slam.n_kf - 1
        assert float(jnp.abs(slam.ikf.bg[kf]).max()) < 5e-3
        assert float(jnp.abs(slam.ikf.ba[kf]).max()) < 0.1
