"""Atlas map-merging test (LoopClosing::MergeLocal analog).

Scenario: track a map, lose tracking hard (long blackout) so the Atlas
shelves it and starts a fresh map, then revisit mapped territory — the
merge path must weld the new map back into the shelved one and express
the trajectory in the original frame.
"""

import dataclasses

import numpy as np
import pytest


@pytest.fixture(scope="module")
def merged_run():
    import jax.numpy as jnp

    from orb_slam3_detailed_comments_kor_tpu.io import synthetic
    from orb_slam3_detailed_comments_kor_tpu.slam.system import (
        SlamSystem, TrackingState,
    )

    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_slam_e2e import BASELINE, FX, H, W, small_config

    base = small_config()
    cfg = dataclasses.replace(
        base, tracking=dataclasses.replace(
            base.tracking, max_frames_between_kf=3
        ),
    )
    slam = SlamSystem(cfg)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    n = 40
    Rs, ts = synthetic.make_trajectory(n, motion="strafe", speed=0.03)

    def feed(i, t):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        return slam.track_stereo(il, ir, t)

    k = 0
    for i in range(n):
        feed(i, k / 20.0)
        k += 1
    slam.flush_decisions()
    assert slam.state == TrackingState.OK
    n_kf_before = slam.n_kf
    assert n_kf_before >= 10, n_kf_before

    # hard loss: >20 garbage frames → CreateMapInAtlas
    black = jnp.zeros((H, W))
    for _ in range(22):
        slam.track_stereo(black, black, k / 20.0)
        k += 1
    assert len(slam.atlas_maps) == 1
    assert slam.n_kf <= 1  # fresh map

    # revisit mapped territory: replay poses 8..20 (the new map initializes
    # in its OWN frame; only the merge can re-anchor it)
    for i in range(8, 22):
        feed(i, k / 20.0)
        k += 1
    slam.flush_decisions()
    return slam, ts, n_kf_before


def test_merge_happened(merged_run):
    slam, ts, n_kf_before = merged_run
    assert len(slam.atlas_maps) == 0, "shelved map was not merged back"
    assert slam.map_stats()["n_maps"] == 1
    assert slam.n_kf > n_kf_before


def test_pose_reanchored_to_old_frame(merged_run):
    slam, ts, _ = merged_run
    # after the weld, the live pose must be expressed in the ORIGINAL map
    # frame, i.e. near ground truth of the revisited pose
    c = slam.camera_center()
    err = np.linalg.norm(c - ts[21])
    assert err < 0.12, f"welded pose off by {err:.3f} m"


def test_trajectory_consistent(merged_run):
    slam, ts, _ = merged_run
    _, centers, _ = slam.trajectory_arrays()
    # the re-anchored tail (post-blackout revisit) should overlap the
    # ground-truth positions it retraced
    tail = centers[-10:]
    gt = ts[12:22]
    err = np.linalg.norm(tail - gt, axis=1).mean()
    assert err < 0.15, f"trajectory tail mean error {err:.3f} m"
