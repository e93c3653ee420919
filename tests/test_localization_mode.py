"""Localization-only mode (System::ActivateLocalizationMode analog) and the
timestamp-jump guard (Tracking.cc:1737-1773)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, SLAMConfig, TrackingConfig,
)
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import (
    SlamSystem, TrackingState,
)

H, W = 240, 376
FX, BASELINE = 230.0, 0.15


def make_cfg():
    return SLAMConfig(
        camera=CameraConfig(
            width=W, height=H, fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
            bf=BASELINE * FX,
        ),
        orb=ORBConfig(n_features=600, cell_size=24),
        capacity=CapacityConfig(
            max_keyframes=32, max_landmarks=8192, max_local_landmarks=2048
        ),
        tracking=TrackingConfig(max_frames_between_kf=8),
    )


@pytest.fixture(scope="module")
def frames():
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    Rs, ts = synthetic.make_trajectory(40, motion="strafe", speed=0.02)
    out = []
    for i in range(40):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        out.append((il, ir))
    return out, ts


class TestLocalizationMode:
    def test_no_new_keyframes_but_still_tracks(self, frames):
        fr, ts = frames
        slam = SlamSystem(make_cfg())
        for i in range(20):
            slam.track_stereo(fr[i][0], fr[i][1], i / 20.0)
        slam.flush_decisions()
        assert slam.state == TrackingState.OK
        n_kf_before = slam.n_kf
        slam.activate_localization_mode()
        for i in range(20, 40):
            slam.track_stereo(fr[i][0], fr[i][1], i / 20.0)
        slam.flush_decisions()
        assert slam.n_kf == n_kf_before  # map frozen
        assert slam.state == TrackingState.OK  # still tracking
        err = np.linalg.norm(slam.camera_center() - ts[39])
        assert err < 0.05, err

    def test_reactivate_resumes_mapping(self, frames):
        fr, ts = frames
        slam = SlamSystem(make_cfg())
        for i in range(10):
            slam.track_stereo(fr[i][0], fr[i][1], i / 20.0)
        slam.activate_localization_mode()
        slam.deactivate_localization_mode()
        for i in range(10, 40):
            slam.track_stereo(fr[i][0], fr[i][1], i / 20.0)
        slam.flush_decisions()
        assert slam.n_kf >= 3


class TestTimestampJump:
    def test_large_gap_spawns_new_map(self, frames):
        fr, _ = frames
        slam = SlamSystem(make_cfg())
        for i in range(39):
            slam.track_stereo(fr[i][0], fr[i][1], i / 20.0)
        slam.flush_decisions()
        assert slam.n_kf >= 5
        # 10-second sensor dropout
        slam.track_stereo(fr[39][0], fr[39][1], 39 / 20.0 + 10.0)
        assert len(slam.atlas_maps) == 1  # old map shelved
        assert slam.state in (
            TrackingState.NOT_INITIALIZED, TrackingState.OK
        )

    def test_small_map_resets(self, frames):
        fr, _ = frames
        slam = SlamSystem(make_cfg())
        for i in range(3):
            slam.track_stereo(fr[i][0], fr[i][1], i / 20.0)
        slam.flush_decisions()
        slam.track_stereo(fr[3][0], fr[3][1], 3 / 20.0 + 10.0)
        assert len(slam.atlas_maps) == 0  # young map dropped, not shelved


class TestLocModeTemporalVO:
    def test_vo_fallback_survives_unmapped_region(self, frames):
        """Temporal VO points in localization mode (``Tracking.cc:2750``):
        strafe far past the mapped region with the map frozen — map-only
        tracking starves, but lifting last-frame stereo depth as temporary
        points keeps the pose chain alive (and no keyframe is created)."""
        fr, ts = frames
        params = jnp.array([FX, FX, W / 2.0, H / 2.0])
        scene = synthetic.default_scene()
        slam = SlamSystem(make_cfg())
        for i in range(14):
            slam.track_stereo(fr[i][0], fr[i][1], i / 20.0)
        slam.flush_decisions()
        assert slam.state == TrackingState.OK
        slam.activate_localization_mode()
        n_kf = slam.n_kf
        # continue the strafe far beyond the mapped span, faster: the
        # frozen map leaves the frustum but frame-to-frame overlap is high
        Rs2, ts2 = synthetic.make_trajectory(70, motion="strafe", speed=0.02)
        last_c = None
        for i in range(14, 62):
            il, ir, _ = synthetic.stereo_pair(
                params, jnp.asarray(Rs2[i]), jnp.asarray(ts2[i]), BASELINE,
                scene, h=H, w=W,
            )
            slam.track_stereo(il, ir, i / 20.0)
        slam.flush_decisions()
        assert slam.n_kf == n_kf  # map stayed frozen
        assert slam.state == TrackingState.OK
        err = np.linalg.norm(slam.camera_center() - ts2[61])
        # VO-chained pose drifts but must stay in the right neighbourhood
        assert err < 0.25, err
