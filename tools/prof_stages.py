"""Stage breakdown of the bench workload (host-wall per span + total).

Runs the exact bench.py sequence with the StageTimer enabled and prints the
span report plus the end-to-end fps, so regressions can be attributed to a
stage. Works on TPU (default env) or CPU (JAX_PLATFORMS=cpu).
"""

import time

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, SLAMConfig, TrackingConfig,
)
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

H, W = 480, 752
FX, BASELINE = 458.0, 0.11


def build():
    cfg = SLAMConfig(
        camera=CameraConfig(
            width=W, height=H, fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
            bf=BASELINE * FX,
        ),
        orb=ORBConfig(n_features=1200, cell_size=32),
        capacity=CapacityConfig(
            max_keyframes=64, max_landmarks=16384, max_local_landmarks=4096
        ),
        tracking=TrackingConfig(max_frames_between_kf=10),
    )
    return SlamSystem(cfg)


def main(n_frames=130):
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    Rs, ts = synthetic.make_trajectory(n_frames, motion="strafe", speed=0.03)
    frames = []
    for i in range(n_frames):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        frames.append((il.block_until_ready(), ir.block_until_ready()))

    warm = build()
    for i in range(n_frames):
        warm.track_stereo(frames[i][0], frames[i][1], i / 20.0)
    warm.flush_decisions()
    jax.block_until_ready(warm.t_cw)
    del warm

    slam = build()
    slam.timer.enabled = True
    t0 = time.time()
    for i in range(n_frames):
        with slam.timer.span("frame"):
            slam.track_stereo(frames[i][0], frames[i][1], i / 20.0)
    jax.block_until_ready(slam.t_cw)
    wall = time.time() - t0
    print(slam.timer.report(), flush=True)
    print(f"\nfps={n_frames / wall:.2f}  wall={wall:.2f}s  "
          f"kf={slam.n_kf}  state={slam.state}")


if __name__ == "__main__":
    main()
