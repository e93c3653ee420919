"""Revisit end-to-end: out-and-back trajectory. With drift inside the
matching radius the tracker reattaches to the existing map (the reference
behaves the same — loop closing only fires beyond the association range;
that path is covered deterministically by test_loop_injected.py). Asserts
drift-free revisit via map reuse."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.eval import ate
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem, TrackingState

import sys
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import small_config, H, W, FX, BASELINE


def run_outback(n_frames=90, enable_loop=True):
    cfg = small_config()
    slam = SlamSystem(cfg)
    slam.enable_loop_closing = enable_loop
    # denser KFs so the revisit offers candidates beyond the min gap
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    Rs, ts = synthetic.make_trajectory(n_frames, motion="outback", speed=0.045)
    for i in range(n_frames):
        img_l, img_r, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        slam.track_stereo(img_l, img_r, i / 20.0)
    return slam, ts


class TestLoopClosing:
    @pytest.fixture(scope="class")
    def runs(self):
        slam_loop, ts = run_outback(enable_loop=True)
        return slam_loop, ts

    def test_still_tracking(self, runs):
        slam, _ = runs
        assert slam.state == TrackingState.OK

    def test_map_reused_not_regrown(self, runs):
        # the return leg must reuse outbound landmarks, not duplicate them
        slam, _ = runs
        import jax.numpy as jnp
        n_lm = int(jnp.sum(slam.ms.lm_valid))
        assert n_lm < 3500, n_lm  # would be ~2x if the map were regrown

    def test_ate_after_loop(self, runs):
        slam, ts = runs
        _, centers, _ = slam.trajectory_arrays()
        rmse = ate.ate_rmse(centers, ts[: len(centers)])
        assert rmse < 0.05, f"ATE {rmse*1000:.1f}mm"

    def test_endpoint_error(self, runs):
        """Out-and-back: the final pose should land near the start."""
        slam, ts = runs
        _, centers, _ = slam.trajectory_arrays()
        end_err = np.linalg.norm(centers[-1] - ts[len(centers) - 1])
        assert end_err < 0.06, end_err
