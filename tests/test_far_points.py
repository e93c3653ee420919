"""thFarPoints gating (reference ``System.cc:113-116`` reads the optional
YAML key; ``ORBmatcher.cc:44-56`` drops map points with track depth beyond
the threshold from SearchByProjection; ``LocalMapping.cc:923`` skips
triangulating beyond it).

The TPU engine applies the same two gates: per-frame association
(``tracking.track_frame`` far_dist) and mapping-time triangulation
(``tracking.triangulate_with_neighbor`` far_dist).
"""

import dataclasses
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import BASELINE, FX, H, W, small_config

from orb_slam3_detailed_comments_kor_tpu.config import CameraConfig
from orb_slam3_detailed_comments_kor_tpu.io import datasets, synthetic
from orb_slam3_detailed_comments_kor_tpu.slam import tracking
from orb_slam3_detailed_comments_kor_tpu.slam.system import (
    SlamSystem, TrackingState,
)


def _run(far: float, n_frames: int = 14):
    cfg = small_config()
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, th_far_points=far)
    )
    slam = SlamSystem(cfg)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    Rs, ts = synthetic.make_trajectory(n_frames, motion="strafe", speed=0.03)
    for i in range(n_frames):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        slam.track_stereo(il, ir, i / 20.0)
    slam.flush_decisions()
    return slam


class TestFarPoints:
    def test_far_gate_drops_far_landmarks_from_tracking(self):
        """With the far threshold INSIDE the scene's depth range, tracking
        must still work but only associate landmarks nearer than the
        threshold (ORBmatcher.cc:56 semantics)."""
        far = 4.5  # default_scene: front wall at 5 m, floor/ceiling nearer
        slam = _run(far)
        assert slam.state == TrackingState.OK
        # every landmark the last tracked frame matched must be nearer
        # than the gate (in the camera frame of the final pose)
        ms = slam.ms
        pc = np.asarray(ms.lm_pos) @ np.asarray(slam.R_cw).T + np.asarray(
            slam.t_cw
        )
        # matched set = landmarks with found counter above the spawn floor
        found = np.asarray(ms.lm_found) > 2
        valid = np.asarray(ms.lm_valid) & found
        assert valid.sum() > 50, "scene should still have near landmarks"
        assert (pc[valid, 2] <= far + 0.5).mean() > 0.95, (
            "far landmarks leaked into the tracked set"
        )

    def test_disabled_gate_keeps_far_landmarks(self):
        slam = _run(0.0)
        assert slam.state == TrackingState.OK
        ms = slam.ms
        pc = np.asarray(ms.lm_pos) @ np.asarray(slam.R_cw).T + np.asarray(
            slam.t_cw
        )
        found = np.asarray(ms.lm_found) > 2
        valid = np.asarray(ms.lm_valid) & found
        # without the gate the tracked set includes points beyond 3 m
        assert (pc[valid, 2] > 4.5).sum() > 10

    def test_yaml_key_parsed(self, tmp_path):
        """`thFarPoints` (TUM_512_outdoors.yaml:79 idiom) reaches the
        typed config; absent key leaves the gate disabled."""
        y = tmp_path / "cam.yaml"
        y.write_text(
            "%YAML:1.0\n"
            "Camera.type: \"PinHole\"\n"
            "Camera.fx: 400.0\nCamera.fy: 400.0\n"
            "Camera.cx: 320.0\nCamera.cy: 240.0\n"
            "Camera.width: 640\nCamera.height: 480\n"
            "Camera.fps: 20.0\nCamera.bf: 40.0\n"
            "thFarPoints: 20.0\n"
        )
        from orb_slam3_detailed_comments_kor_tpu.config import SensorType
        cfg = datasets.load_settings(str(y), SensorType.STEREO).config
        assert cfg.camera.th_far_points == 20.0
        y2 = tmp_path / "cam2.yaml"
        y2.write_text(
            "%YAML:1.0\n"
            "Camera.type: \"PinHole\"\n"
            "Camera.fx: 400.0\nCamera.fy: 400.0\n"
            "Camera.cx: 320.0\nCamera.cy: 240.0\n"
            "Camera.width: 640\nCamera.height: 480\n"
            "Camera.fps: 20.0\nCamera.bf: 40.0\n"
        )
        cfg2 = datasets.load_settings(str(y2), SensorType.STEREO).config
        assert cfg2.camera.th_far_points == 0.0
