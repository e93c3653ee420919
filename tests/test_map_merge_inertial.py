"""Inertial Atlas merging (LoopClosing::MergeLocal2, ``LoopClosing.cc:1837``):
a VI map is shelved on hard tracking loss; when the fresh map revisits
mapped territory the merge must weld the INERTIAL state too — the old map's
gravity frame wins and the IMU stays initialized across the weld."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import (
    SlamSystem, TrackingState,
)

import sys
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_vi_e2e import BASELINE, FPS, FX, H, IMU_RATE, W, vi_config


@pytest.fixture(scope="module")
def merged_vi_run():
    import dataclasses

    cfg = vi_config()
    cfg = dataclasses.replace(
        cfg, tracking=dataclasses.replace(
            cfg.tracking, max_frames_between_kf=4,
            # shorten the inertial RECENTLY_LOST coast (production default
            # 5 s = 100 frames, Tracking.cc:1904-1917) so the 24 black
            # frames below reach hard loss and shelve the map
            time_recently_lost=0.8,
        ),
    )
    slam = SlamSystem(cfg)
    traj = synthetic.AnalyticTrajectory()
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()

    def imu_between(i):
        samples = []
        if i > 0:
            t0, t1 = (i - 1) / FPS, i / FPS
            n = int(round((t1 - t0) * IMU_RATE))
            dt = (t1 - t0) / n
            for k in range(n):
                ts = t0 + (k + 0.5) * dt
                acc, gyro = traj.imu_at(ts)
                samples.append(
                    (t0 + (k + 1) * dt, np.asarray(acc), np.asarray(gyro))
                )
        return samples

    def feed(i, frame_idx):
        """Render trajectory pose i, feed it at frame_idx's timestamp with
        the IMU of the (i-1, i] motion window relabeled onto the fed
        timeline (the revisit replays real motion at later wall times)."""
        t_img = frame_idx / FPS
        R_wb, p_wb = traj.pose(i / FPS)
        il, ir, _ = synthetic.stereo_pair(
            params, R_wb, p_wb, BASELINE, scene, h=H, w=W
        )
        samples = []
        if frame_idx > 0 and i > 0:
            t0 = (i - 1) / FPS
            n = int(round((1.0 / FPS) * IMU_RATE))
            dt = (1.0 / FPS) / n
            fed_t0 = (frame_idx - 1) / FPS
            for k in range(n):
                acc, gyro = traj.imu_at(t0 + (k + 0.5) * dt)
                samples.append(
                    (fed_t0 + (k + 1) * dt, np.asarray(acc), np.asarray(gyro))
                )
        slam.track_stereo_inertial(il, ir, t_img, samples)

    k = 0
    for i in range(70):
        feed(i, k)
        k += 1
    slam.flush_decisions()
    assert slam.state == TrackingState.OK
    assert slam.imu_initialized
    g_before = np.asarray(slam.gravity).copy()
    n_kf_before = slam.n_kf

    # hard loss: black frames until the Atlas shelves the map
    black = jnp.zeros((H, W))
    for _ in range(24):
        slam.track_stereo_inertial(black, black, k / FPS, imu_between(0))
        k += 1
    assert len(slam.atlas_maps) == 1
    shelf_has_ikf = "ikf" in slam.atlas_maps[0]

    # revisit mapped territory (replay poses 15..34)
    for i in range(15, 35):
        feed(i, k)
        k += 1
    slam.flush_decisions()
    return slam, g_before, n_kf_before, shelf_has_ikf


def test_shelf_carries_inertial_state(merged_vi_run):
    _, _, _, shelf_has_ikf = merged_vi_run
    assert shelf_has_ikf


def test_merge_welds_maps(merged_vi_run):
    slam, _, n_kf_before, _ = merged_vi_run
    assert len(slam.atlas_maps) == 0, "shelved VI map was not merged back"
    assert slam.n_kf > n_kf_before


def test_gravity_frame_survives_merge(merged_vi_run):
    """MergeLocal2 keeps the old map's gravity-aligned frame."""
    slam, g_before, _, _ = merged_vi_run
    assert slam.imu_initialized
    g = np.asarray(slam.gravity)
    cos = g @ g_before / (np.linalg.norm(g) * np.linalg.norm(g_before))
    assert cos > 0.999, (g, g_before)


def test_tracking_continues_after_weld(merged_vi_run):
    slam, _, _, _ = merged_vi_run
    assert slam.state == TrackingState.OK
