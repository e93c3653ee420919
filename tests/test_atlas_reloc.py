"""Atlas-wide relocalization (Tracking::Relocalization over the shared
KeyFrameDatabase): when tracking is lost in the ACTIVE map but the frame
matches a SHELVED map, the system must switch back to that map."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import (
    SlamSystem, TrackingState,
)
from orb_slam3_detailed_comments_kor_tpu.utils import lie

import sys
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import BASELINE, FX, H, W, small_config


def pose_a(i):
    """Region A: looking at the front wall, strafing +x."""
    return np.eye(3), np.array([0.03 * i, 0.02 * np.sin(0.2 * i), 0.0])


def pose_b(i):
    """Region B: turned 180° (back wall), different territory."""
    R = np.asarray(lie.so3_exp(jnp.array([0.0, np.pi, 0.0])))
    return R, np.array([-0.03 * i, 0.0, 0.5])


def test_reloc_switches_to_shelved_map():
    base = small_config()
    cfg = dataclasses.replace(
        base, tracking=dataclasses.replace(
            base.tracking, max_frames_between_kf=3
        ),
    )
    slam = SlamSystem(cfg)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()

    def feed(R, t, time):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(R), jnp.asarray(t), BASELINE, scene,
            h=H, w=W,
        )
        return slam.track_stereo(il, ir, time)

    k = 0
    # --- map A -----------------------------------------------------------
    for i in range(36):
        feed(*pose_a(i), k / 20.0)
        k += 1
    slam.flush_decisions()
    assert slam.state == TrackingState.OK
    n_kf_a = slam.n_kf
    assert n_kf_a >= 10

    # shelve A deliberately (the timestamp-jump / hard-loss path is covered
    # elsewhere) and bootstrap map B in different territory
    slam._create_map_in_atlas()
    assert len(slam.atlas_maps) == 1
    for i in range(24):
        feed(*pose_b(i), k / 20.0)
        k += 1
    slam.flush_decisions()
    assert slam.state == TrackingState.OK
    assert slam.n_kf >= 3

    # --- show map-A territory again: B cannot explain it ------------------
    switched = False
    for i in range(10, 26):
        feed(*pose_a(i), k / 20.0)
        k += 1
        if slam.n_kf >= n_kf_a:  # active map is A again
            switched = True
            break
    assert switched, (slam.n_kf, n_kf_a, len(slam.atlas_maps))
    # B was shelved in A's place (it was mature enough)
    assert len(slam.atlas_maps) == 1
    # live pose must be expressed in map A's frame, near the revisited spot
    slam.flush_decisions()
    c = slam.camera_center()
    _, t_gt = pose_a(i)
    assert np.linalg.norm(c - t_gt) < 0.15, (c, t_gt)
