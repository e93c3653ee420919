"""Atlas multi-map + keyframe culling tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem, TrackingState

import sys
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import small_config, H, W, FX, BASELINE


class TestAtlas:
    def test_new_map_after_hard_loss(self):
        """Mature map + prolonged blackout at a place with no map coverage →
        shelve the map and bootstrap a fresh one (CreateMapInAtlas)."""
        import dataclasses

        cfg = small_config()
        cfg = dataclasses.replace(
            cfg,
            tracking=dataclasses.replace(cfg.tracking, max_frames_between_kf=5),
        )
        slam = SlamSystem(cfg)
        params = jnp.array([FX, FX, W / 2.0, H / 2.0])
        scene = synthetic.default_scene()
        Rs, ts = synthetic.make_trajectory(60, motion="strafe", speed=0.045)
        for i in range(60):
            il, ir, _ = synthetic.stereo_pair(
                params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE,
                scene, h=H, w=W,
            )
            slam.track_stereo(il, ir, i / 20.0)
        assert slam.state == TrackingState.OK
        kfs_before = slam.n_kf
        assert kfs_before >= 10
        # long blackout (> 20 frames) → hard loss → new map
        black = jnp.zeros((H, W))
        for k in range(22):
            slam.track_stereo(black, black, (60 + k) / 20.0)
        assert len(slam.atlas_maps) == 1
        assert slam.state == TrackingState.NOT_INITIALIZED
        assert slam.n_kf == 0
        # good frames again (different world offset) → fresh map bootstraps
        for i in range(10):
            il, ir, _ = synthetic.stereo_pair(
                params, jnp.eye(3), jnp.array([0.0, 0.3, 0.5]), BASELINE,
                scene, h=H, w=W,
            )
            st = slam.track_stereo(il, ir, (85 + i) / 20.0)
        assert st == TrackingState.OK
        assert slam.map_stats()["n_maps"] == 2


class TestKeyFrameCulling:
    def test_redundant_kfs_removed(self):
        """Slow motion with dense keyframes → redundancy culling fires
        (KeyFrameCulling 90% rule)."""
        import dataclasses
        from orb_slam3_detailed_comments_kor_tpu.config import TrackingConfig

        cfg = small_config()
        cfg = dataclasses.replace(
            cfg,
            tracking=dataclasses.replace(
                cfg.tracking, max_frames_between_kf=2
            ),
        )
        slam = SlamSystem(cfg)
        params = jnp.array([FX, FX, W / 2.0, H / 2.0])
        scene = synthetic.default_scene()
        # very slow motion → keyframes are highly redundant
        Rs, ts = synthetic.make_trajectory(40, motion="strafe", speed=0.008)
        for i in range(40):
            il, ir, _ = synthetic.stereo_pair(
                params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE,
                scene, h=H, w=W,
            )
            slam.track_stereo(il, ir, i / 20.0)
        n_valid = int(jnp.sum(slam.ms.kf_valid))
        assert slam.state == TrackingState.OK
        assert n_valid < slam.n_kf, (n_valid, slam.n_kf)
