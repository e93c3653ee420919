"""Map save/load (checkpoint/resume) tests.

The reference never implemented ``System::SaveMap/LoadMap``
(``System.h:179-181`` TODO); here snapshot/restore is a first-class
feature: array state round-trips exactly and tracking resumes seamlessly.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def short_run():
    import jax.numpy as jnp

    from orb_slam3_detailed_comments_kor_tpu.config import (
        CameraConfig, CapacityConfig, ORBConfig, SLAMConfig, TrackingConfig,
    )
    from orb_slam3_detailed_comments_kor_tpu.io import synthetic
    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

    H, W, FX, BL = 240, 376, 230.0, 0.11
    cfg = SLAMConfig(
        camera=CameraConfig(
            width=W, height=H, fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
            bf=BL * FX,
        ),
        orb=ORBConfig(n_features=600, cell_size=24),
        capacity=CapacityConfig(
            max_keyframes=32, max_landmarks=4096, max_local_landmarks=1024
        ),
        tracking=TrackingConfig(),
    )
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    n = 16
    Rs, ts = synthetic.make_trajectory(n, motion="strafe", speed=0.03)
    frames = []
    for i in range(n):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BL, scene,
            h=H, w=W,
        )
        frames.append((np.asarray(il), np.asarray(ir)))
    slam = SlamSystem(cfg)
    for i in range(10):
        slam.track_stereo(frames[i][0], frames[i][1], i / 20.0)
    slam.flush_decisions()
    return cfg, frames, slam, (Rs, ts)


def test_roundtrip_exact(short_run, tmp_path):
    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

    cfg, frames, slam, _ = short_run
    p = str(tmp_path / "map.npz")
    slam.save_map(p)
    slam2 = SlamSystem(cfg)
    slam2.load_map(p)
    for a, b in zip(slam.ms, slam2.ms):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert slam2.n_kf == slam.n_kf
    assert slam2.state == slam.state
    np.testing.assert_array_equal(np.asarray(slam.R_cw), np.asarray(slam2.R_cw))


def test_resume_tracking(short_run, tmp_path):
    from orb_slam3_detailed_comments_kor_tpu.slam.system import (
        SlamSystem, TrackingState,
    )

    cfg, frames, slam, (Rs, ts) = short_run
    p = str(tmp_path / "map.npz")
    slam.save_map(p)
    slam2 = SlamSystem(cfg)
    slam2.load_map(p)
    for i in range(10, 16):
        st = slam2.track_stereo(frames[i][0], frames[i][1], i / 20.0)
    slam2.flush_decisions()
    assert slam2.state == TrackingState.OK
    # resumed tracking should follow ground truth: compare final center
    c_est = slam2.camera_center()
    err = np.linalg.norm(c_est - ts[15])
    assert err < 0.05, f"resumed tracking drifted: {err}"


def test_capacity_mismatch_rejected(short_run, tmp_path):
    import dataclasses

    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

    cfg, frames, slam, _ = short_run
    p = str(tmp_path / "map.npz")
    slam.save_map(p)
    cap2 = dataclasses.replace(cfg.capacity, max_keyframes=16)
    cfg2 = dataclasses.replace(cfg, capacity=cap2)
    slam3 = SlamSystem(cfg2)
    with pytest.raises(ValueError, match="capacity mismatch"):
        slam3.load_map(p)
