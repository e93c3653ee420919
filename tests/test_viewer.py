"""Viewer subsystem tests (FrameDrawer / MapDrawer / HTML export analogs)."""

import os

import numpy as np
import pytest


def test_draw_frame_overlay():
    from orb_slam3_detailed_comments_kor_tpu.viz import viewer

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    xy = np.array([[10.0, 10.0], [30.0, 20.0], [60.0, 40.0]])
    valid = np.array([True, True, False])
    tracked = np.array([True, False, False])
    out = viewer.draw_frame(img, xy, valid, tracked)
    assert out.shape == (48, 64, 3) and out.dtype == np.uint8
    # tracked keypoint ring is green
    assert out[10 - 3, 10, 1] == 255 and out[10 - 3, 10, 0] == 0
    # untracked is blue
    assert out[20 - 3, 30, 2] == 255
    # invalid keypoint left untouched (gray everywhere around it)
    assert out[40 - 3, 60, 0] == out[40 - 3, 60, 1] == out[40 - 3, 60, 2]


@pytest.fixture(scope="module")
def tracked_slam():
    import jax.numpy as jnp

    from orb_slam3_detailed_comments_kor_tpu.io import synthetic
    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_slam_e2e import BASELINE, FX, H, W, small_config

    cfg = small_config()
    slam = SlamSystem(cfg)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    Rs, ts = synthetic.make_trajectory(10, motion="strafe", speed=0.03)
    for i in range(10):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        slam.track_stereo(il, ir, i / 20.0)
    slam.flush_decisions()
    return slam


def test_render_map_png(tracked_slam, tmp_path):
    from orb_slam3_detailed_comments_kor_tpu.viz import viewer

    p = str(tmp_path / "map.png")
    viewer.render_map(tracked_slam, p)
    assert os.path.exists(p) and os.path.getsize(p) > 5000


def test_export_html(tracked_slam, tmp_path):
    from orb_slam3_detailed_comments_kor_tpu.viz import viewer

    p = str(tmp_path / "map.html")
    viewer.export_html(tracked_slam, p)
    txt = open(p).read()
    assert "landmarks" in txt and '"kf":' in txt
    # data block should contain real landmarks
    import json
    import re

    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", txt).group(1))
    assert len(data["lm"]) > 100
    assert len(data["kf"]) >= 1
    assert len(data["traj"]) == 10
