"""RGB-D mode + relocalization end-to-end tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.eval import ate
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem, TrackingState

import sys
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import small_config, H, W, FX, BASELINE


class TestRGBD:
    def test_rgbd_tracking(self):
        """RGB-D mode: depth map instead of a right image (rgbd_tum analog)."""
        cfg = small_config()
        slam = SlamSystem(cfg)
        params = jnp.array([FX, FX, W / 2.0, H / 2.0])
        scene = synthetic.default_scene()
        Rs, ts = synthetic.make_trajectory(30, motion="strafe", speed=0.03)
        for i in range(30):
            img, depth = synthetic.render(
                params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), scene, h=H, w=W
            )
            slam.track_rgbd(img, depth, i / 20.0)
        assert slam.state == TrackingState.OK
        _, centers, _ = slam.trajectory_arrays()
        rmse = ate.ate_rmse(centers, ts[: len(centers)])
        # RGB-D depth is exact → should beat stereo
        assert rmse < 0.02, f"ATE {rmse*1000:.1f}mm"
        assert slam.map_stats()["n_landmarks"] > 200


class TestRelocalization:
    def test_recovers_after_blackout(self):
        """Feed garbage frames (sensor dropout), then a good frame at a
        DIFFERENT pose than where tracking was lost — relocalization must
        re-acquire (Tracking.cc:3734 semantics)."""
        cfg = small_config()
        slam = SlamSystem(cfg)
        params = jnp.array([FX, FX, W / 2.0, H / 2.0])
        scene = synthetic.default_scene()
        Rs, ts = synthetic.make_trajectory(40, motion="strafe", speed=0.03)
        for i in range(25):
            il, ir, _ = synthetic.stereo_pair(
                params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE,
                scene, h=H, w=W,
            )
            slam.track_stereo(il, ir, i / 20.0)
        assert slam.state == TrackingState.OK
        # blackout: 3 black frames. Decisions are resolved asynchronously
        # (batched device→host readback, see SlamSystem._track) — the loss
        # must be visible at the flush point, the system's synchronization
        # contract. Without pacing, the host outruns the device here; under
        # real-time feeding the opportunistic consume resolves it in-stream.
        black = jnp.zeros((H, W))
        for k in range(3):
            slam.track_stereo(black, black, (25 + k) / 20.0)
        slam.flush_decisions()
        assert slam.state != TrackingState.OK
        # reappear at an EARLIER pose (jump back)
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[5]), jnp.asarray(ts[5]), BASELINE, scene,
            h=H, w=W,
        )
        st = slam.track_stereo(il, ir, 29 / 20.0)
        assert st == TrackingState.OK, st
        err = np.linalg.norm(slam.camera_center() - ts[5])
        assert err < 0.05, err
