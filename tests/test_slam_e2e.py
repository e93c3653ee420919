"""End-to-end stereo SLAM on a synthetic sequence with exact ground truth:
the north-star integration test (SURVEY.md §4 strategy — ATE after alignment
mirrors evaluation/evaluate_ate_scale.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, SLAMConfig, SensorType,
    TrackingConfig,
)
from orb_slam3_detailed_comments_kor_tpu.eval import ate
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem, TrackingState

H, W = 240, 376
FX = 230.0
BASELINE = 0.11


def small_config() -> SLAMConfig:
    return SLAMConfig(
        sensor=SensorType.STEREO,
        camera=CameraConfig(
            width=W, height=H, fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
            bf=BASELINE * FX, th_depth=35.0,
        ),
        orb=ORBConfig(n_features=600, cell_size=24),
        capacity=CapacityConfig(
            max_keyframes=32, max_landmarks=4096, max_local_landmarks=2048,
        ),
        tracking=TrackingConfig(max_frames_between_kf=10),
    )


def run_sequence(n_frames=40, motion="strafe", speed=0.03):
    cfg = small_config()
    sys = SlamSystem(cfg)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    Rs, ts = synthetic.make_trajectory(n_frames, motion=motion, speed=speed)
    fps = 20.0
    for i in range(n_frames):
        imgL, imgR, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        sys.track_stereo(imgL, imgR, i / fps)
    return sys, Rs, ts


class TestStereoSlam:
    @pytest.fixture(scope="class")
    def run(self):
        return run_sequence()

    def test_stays_tracking(self, run):
        sys, _, _ = run
        assert sys.state == TrackingState.OK

    def test_map_grows(self, run):
        sys, _, _ = run
        stats = sys.map_stats()
        assert stats["n_keyframes"] >= 2
        assert stats["n_landmarks"] > 200

    def test_ate(self, run):
        sys, Rs, ts_gt = run
        _, centers, _ = sys.trajectory_arrays()
        rmse = ate.ate_rmse(centers, ts_gt)
        # synthetic, noise-free rendering: expect centimetre-level ATE
        assert rmse < 0.02, f"ATE {rmse:.4f} m"

    def test_trajectory_length(self, run):
        sys, _, ts_gt = run
        _, centers, _ = sys.trajectory_arrays()
        est_len = np.linalg.norm(np.diff(centers, axis=0), axis=1).sum()
        gt_len = np.linalg.norm(np.diff(ts_gt, axis=0), axis=1).sum()
        assert abs(est_len - gt_len) / gt_len < 0.1


class TestArcMotion:
    def test_rotation_tracked(self):
        sys, Rs, ts_gt = run_sequence(n_frames=30, motion="arc", speed=0.03)
        assert sys.state == TrackingState.OK
        _, centers, _ = sys.trajectory_arrays()
        rmse = ate.ate_rmse(centers, ts_gt)
        assert rmse < 0.03, f"ATE {rmse:.4f} m"
