"""Default-capacity smoke: the production config (512 keyframes, 32,768
landmarks — `CapacityConfig` defaults) must compile and run the full
pipeline, including place-recognition insertion + detection + the
whole-capacity covisibility build, without OOM or minute-long stalls
(VERDICT r3 #5: nothing in the suite previously ran at the configured
defaults; the dense BoW database was 205 MB/map there).
"""

import time

import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, SLAMConfig, TrackingConfig,
)
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam import map_state as msx
from orb_slam3_detailed_comments_kor_tpu.slam.system import (
    SlamSystem, TrackingState,
)

H, W, FX, BASELINE = 240, 376, 230.0, 0.11


def test_default_capacity_pipeline():
    cfg = SLAMConfig(
        camera=CameraConfig(
            width=W, height=H, fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
            bf=BASELINE * FX,
        ),
        orb=ORBConfig(n_features=600, cell_size=24),
        capacity=CapacityConfig(),  # the defaults: 512 KF / 32k landmarks
        tracking=TrackingConfig(max_frames_between_kf=4),
    )
    slam = SlamSystem(cfg)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    Rs, ts = synthetic.make_trajectory(30, motion="strafe", speed=0.04)
    for i in range(30):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        slam.track_stereo(il, ir, i / 20.0)
    slam.flush_decisions()
    assert slam.state == TrackingState.OK
    assert slam.n_kf >= 6

    # sparse BoW database memory at full capacity: a few MB, not 205 MB
    lc = slam.loop_closer
    db_bytes = lc.db_words.size * 4 + lc.db_wts.size * 4
    assert db_bytes < 16 * 2**20, f"BoW DB {db_bytes / 2**20:.1f} MB"

    # whole-capacity covisibility build + a detection pass at K=512
    # shapes (masked): the per-KF insertion path runs these every keyframe
    t0 = time.perf_counter()
    cov = np.asarray(
        msx.covisibility_weights(slam.ms, jnp.arange(slam.ms.K))
    )
    cand = lc.detect(slam.ms, slam.n_kf - 1, slam.n_kf)
    dt = time.perf_counter() - t0
    assert cov.shape == (512, 512)
    assert int(cand) < slam.n_kf  # no self/neighbour candidate nonsense
    # bounded: seconds on the CPU test backend (sub-ms on the chip), not
    # the minute-scale stall the dense-rebuild concern predicted
    assert dt < 60.0, f"covisibility+detect took {dt:.1f}s"
