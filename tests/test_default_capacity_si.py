"""Inertial default-capacity smoke (VERDICT r4 #8): the STEREO-INERTIAL
pipeline must compile and run at the production ``CapacityConfig()``
defaults (512 keyframes / 32,768 landmarks) — IMU initialization, the
per-frame VIO refinement, the VI local-BA slices, AND a whole-map
inertial-GBA chunk, all at the full-capacity program shapes (the visual
path is covered by test_default_capacity.py; the VI programs have
different shapes and were previously never exercised at the defaults).
"""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_vi_e2e import BASELINE, FPS, FX, H, IMU_RATE, W, vi_config

from orb_slam3_detailed_comments_kor_tpu.config import CapacityConfig
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import (
    SlamSystem, TrackingState,
)


def test_default_capacity_stereo_inertial():
    import dataclasses

    cfg = dataclasses.replace(vi_config(), capacity=CapacityConfig())
    assert cfg.capacity.max_keyframes == 512
    assert cfg.capacity.max_landmarks == 32768
    slam = SlamSystem(cfg)
    traj = synthetic.AnalyticTrajectory()
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    n_frames = 110  # enough for the IMU-init schedule to complete
    for i in range(n_frames):
        t = i / FPS
        R_wb, p_wb = traj.pose(t)
        il, ir, _ = synthetic.stereo_pair(
            params, R_wb, p_wb, BASELINE, scene, h=H, w=W
        )
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
        slam.track_stereo_inertial(il, ir, t, samples)
    slam.flush_decisions()
    assert slam.state == TrackingState.OK
    assert slam.imu_initialized, "IMU init must complete at default shapes"
    assert slam.n_kf >= 8
    # gravity recovered (the init solve ran at the default shapes)
    g = np.asarray(slam.gravity)
    assert abs(np.linalg.norm(g) - 9.81) < 0.3

    # one whole-map inertial GBA chunk at K=512 shapes: the >128-KF branch
    # of _service_gba dispatches full_inertial_ba over the full capacity
    # (LoopClosing.cc:2287-2289 FullInertialBA-as-GBA analog)
    assert slam.ms.K == 512
    slam._gba_chunks_left = 1
    slam._gba_prev_cost = None
    slam._service_gba()
    assert slam._gba_chunks_run >= 1
    # the sweep must leave the map finite and tracking-consistent
    assert bool(jnp.isfinite(slam.ms.kf_t_cw[: slam.n_kf]).all())
    assert bool(jnp.isfinite(slam.ikf.vel[: slam.n_kf]).all())
