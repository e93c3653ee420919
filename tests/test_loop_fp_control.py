"""Place-recognition false-positive control: a no-loop trajectory over a
self-similar scene must close ZERO loops even with a dense keyframe cadence
(VERDICT r1 item 6 'done' criterion; reference guards:
KeyFrameDatabase::DetectNBestCandidates covisibility-group accumulation +
LoopClosing temporal consistency, ``KeyFrameDatabase.cc:604``,
``LoopClosing.cc:447,502``)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import (
    SlamSystem, TrackingState,
)

import sys
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import BASELINE, FX, H, W, small_config


def test_no_loop_control_sequence():
    """520-frame one-way corridor pass (never revisits) under dense KF
    cadence AND capacity pressure (128-KF cap, ~260 insertions): every BoW
    candidate the detector surfaces is a false positive by construction,
    and the consistency + Sim3-verification chain must reject all of them
    (VERDICT r2 weak-2 raised this from the original 160 frames)."""
    base = small_config()
    cfg = dataclasses.replace(
        base,
        capacity=dataclasses.replace(
            base.capacity, max_keyframes=128, max_landmarks=8192
        ),
        tracking=dataclasses.replace(
            base.tracking, max_frames_between_kf=2, min_frames_between_kf=1
        ),
    )
    slam = SlamSystem(cfg)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.corridor_scene()
    # one-way pass along the corridor, never revisiting: views stay fresh
    # but the lattice texture is self-similar — prime FP bait
    n = 520
    for i in range(n):
        t_wc = np.array([0.025 * i, 0.005 * np.sin(0.15 * i), 0.0])
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.eye(3), jnp.asarray(t_wc), BASELINE, scene,
            h=H, w=W,
        )
        slam.track_stereo(il, ir, i / 20.0)
    slam.flush_decisions()
    assert slam.state == TrackingState.OK
    assert slam.n_kf >= 80, slam.n_kf  # dense cadence actually happened
    assert slam.loop_closer.n_loops_closed == 0, (
        slam.loop_closer.n_loops_closed
    )
