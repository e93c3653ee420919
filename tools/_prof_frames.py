"""Per-frame wall-time distribution for the bench workload."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, SLAMConfig, TrackingConfig,
)
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

H, W = 480, 752
FX, BASELINE = 458.0, 0.11
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
params = jnp.array([FX, FX, W / 2.0, H / 2.0])
scene = synthetic.default_scene()
n_frames = 130
Rs, ts = synthetic.make_trajectory(n_frames, motion="strafe", speed=0.03)
frames = []
for i in range(n_frames):
    il, ir, _ = synthetic.stereo_pair(
        params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
        h=H, w=W,
    )
    frames.append((il.block_until_ready(), ir.block_until_ready()))

warm = SlamSystem(cfg)
for i in range(n_frames):
    warm.track_stereo(frames[i][0], frames[i][1], i / 20.0)
warm.flush_decisions()
jax.block_until_ready(warm.t_cw)
del warm

slam = SlamSystem(cfg)
slam.timer.enabled = True
kf_counts = []
times = []
t_all0 = time.time()
for i in range(n_frames):
    nk0 = slam.n_kf
    t0 = time.time()
    slam.track_stereo(frames[i][0], frames[i][1], i / 20.0)
    times.append(time.time() - t0)
    kf_counts.append(slam.n_kf - nk0)
jax.block_until_ready(slam.t_cw)
wall = time.time() - t_all0
times = np.array(times)
kf_counts = np.array(kf_counts)
print(f"total: {wall*1e3:.0f} ms for {n_frames} frames -> {n_frames/wall:.1f} fps")
is_kf = kf_counts > 0
print(f"KF frames: {is_kf.sum()}  mean {times[is_kf].mean()*1e3:.1f} ms")
print(f"plain frames: {(~is_kf).sum()}  mean {times[~is_kf].mean()*1e3:.1f} ms")
print("plain percentiles ms:", np.percentile(times[~is_kf] * 1e3, [10, 50, 90, 99]).round(1))
print("kf percentiles ms:", np.percentile(times[is_kf] * 1e3, [10, 50, 90, 99]).round(1))
print(slam.timer.report())
