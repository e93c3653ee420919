"""Monocular-inertial SLAM end-to-end: two-view init at arbitrary scale,
VI initialization solves the metric scale (InertialOptimization with
VertexScale, Optimizer.cc:4686) and the map is re-gauged
(Map::ApplyScaledRotation, Map.cc:289)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.config import (
    CameraConfig, CapacityConfig, IMUConfig, ORBConfig, SLAMConfig,
    SensorType, TrackingConfig,
)
from orb_slam3_detailed_comments_kor_tpu.eval import ate
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import (
    SlamSystem, TrackingState,
)

H, W = 240, 376
FX = 230.0
FPS = 20.0
IMU_RATE = 200.0


def mi_config() -> SLAMConfig:
    return SLAMConfig(
        sensor=SensorType.IMU_MONOCULAR,
        camera=CameraConfig(
            width=W, height=H, fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0, bf=0.0,
        ),
        orb=ORBConfig(n_features=600, cell_size=24),
        imu=IMUConfig(frequency=IMU_RATE),
        capacity=CapacityConfig(
            max_keyframes=32, max_landmarks=4096, max_local_landmarks=2048,
        ),
        tracking=TrackingConfig(max_frames_between_kf=6),
    )


def run_mi_sequence(n_frames=130):
    slam = SlamSystem(mi_config())
    # mono-inertial scale is only observable under acceleration excitation
    # (the reference requires 2 s of excited MAV motion before mono VI
    # init, LocalMapping.cc:1574-1607) — the default gentle trajectory has
    # near-constant acceleration and the scale solve is noise-dominated
    traj = synthetic.AnalyticTrajectory(excitation=3.0)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    gt_pos = []
    for i in range(n_frames):
        t = i / FPS
        R_wb, p_wb = traj.pose(t)
        gt_pos.append(np.asarray(p_wb))
        img, _ = synthetic.render(params, R_wb, p_wb, scene, h=H, w=W)
        samples = []
        if i > 0:
            t0 = (i - 1) / FPS
            n = int(round((t - t0) * IMU_RATE))
            dt = (t - t0) / n
            for k in range(n):
                ts = t0 + (k + 0.5) * dt
                acc, gyro = traj.imu_at(ts)
                samples.append(
                    (t0 + (k + 1) * dt, np.asarray(acc), np.asarray(gyro))
                )
        slam.track_mono_inertial(img, t, samples)
    slam.flush_decisions()
    return slam, np.stack(gt_pos)


class TestMonoInertial:
    @pytest.fixture(scope="class")
    def run(self):
        return run_mi_sequence()

    def test_tracking_ok(self, run):
        slam, _ = run
        assert slam.state == TrackingState.OK

    def test_imu_initialized(self, run):
        slam, _ = run
        assert slam.imu_initialized

    def test_metric_scale_recovered(self, run):
        """The mono map's gauge is arbitrary before VI init; afterwards the
        trajectory must be METRIC — compare absolute (unaligned-scale)
        trajectory span against ground truth."""
        slam, gt = run
        _, centers, _ = slam.trajectory_arrays()
        n = min(len(centers), len(gt))
        est_len = np.linalg.norm(np.diff(centers[:n], axis=0), axis=1).sum()
        gt_len = np.linalg.norm(np.diff(gt[:n], axis=0), axis=1).sum()
        # arc length over-reads under per-frame jitter (~8 mm/frame here),
        # so the bound is loose; the scale itself is verified much tighter
        # by the stride-10 comparison below
        assert abs(est_len - gt_len) / gt_len < 0.25, (est_len, gt_len)
        c10, g10 = centers[:n:10], gt[:n:10]
        est10 = np.linalg.norm(np.diff(c10, axis=0), axis=1).sum()
        gt10 = np.linalg.norm(np.diff(g10, axis=0), axis=1).sum()
        assert abs(est10 - gt10) / gt10 < 0.12, (est10, gt10)

    def test_gravity_recovered(self, run):
        slam, _ = run
        g = np.asarray(slam.gravity)
        cos = g @ np.array([0.0, 9.81, 0.0]) / (np.linalg.norm(g) * 9.81)
        ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert ang < 6.0, (g, ang)

    def test_ate_reasonable(self, run):
        slam, gt = run
        _, centers, _ = slam.trajectory_arrays()
        n = min(len(centers), len(gt))
        rmse = ate.ate_rmse(centers[:n], gt[:n])  # aligned (scale-free) ATE
        # mono + sliding-window VI-BA drifts without loop closure; the
        # bound reflects map-drift level (<1% of a 5.9 m path). Multi-
        # neighbour triangulation + the LK stereo refine + the third
        # tracking stage brought the r1 regression (0.111) down to ~0.023.
        assert rmse < 0.05, rmse
