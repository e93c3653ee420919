"""Split per-frame cost: pure device throughput (no host decisions) vs full."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, SLAMConfig, TrackingConfig,
)
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem
from orb_slam3_detailed_comments_kor_tpu.slam import frontend as fe, tracking

H, W = 480, 752
FX, BASELINE = 458.0, 0.11
cfg = SLAMConfig(
    camera=CameraConfig(width=W, height=H, fx=FX, fy=FX, cx=W / 2.0,
                        cy=H / 2.0, bf=BASELINE * FX),
    orb=ORBConfig(n_features=1200, cell_size=32),
    capacity=CapacityConfig(max_keyframes=64, max_landmarks=16384,
                            max_local_landmarks=4096),
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
        h=H, w=W)
    frames.append((il.block_until_ready(), ir.block_until_ready()))

# warm (also enters stable mode via decide syncs)
warm = SlamSystem(cfg)
for i in range(n_frames):
    warm.track_stereo(frames[i][0], frames[i][1], i / 20.0)
warm.flush_decisions()
jax.block_until_ready(warm.t_cw)
del warm

# ---- pass A: decisions disabled → pure device throughput of the frame step
slam = SlamSystem(cfg)
# build a small map first so tracking has landmarks (5 KFs)
for i in range(30):
    slam.track_stereo(frames[i][0], frames[i][1], i / 20.0)
slam.flush_decisions()
jax.block_until_ready(slam.t_cw)
orig_decide = SlamSystem._decide
SlamSystem._decide = lambda self, *a, **k: None
t0 = time.time()
for i in range(30, 130):
    slam.track_stereo(frames[i][0], frames[i][1], i / 20.0)
jax.block_until_ready(slam.t_cw)
dt = (time.time() - t0) / 100 * 1e3
print(f"frame step, NO decides : {dt:6.2f} ms/frame -> {1000/dt:.1f} fps", flush=True)
SlamSystem._decide = orig_decide

# ---- pass B: full pipeline
slam2 = SlamSystem(cfg)
t0 = time.time()
for i in range(n_frames):
    slam2.track_stereo(frames[i][0], frames[i][1], i / 20.0)
jax.block_until_ready(slam2.t_cw)
dt = (time.time() - t0) / n_frames * 1e3
print(f"full pipeline          : {dt:6.2f} ms/frame -> {1000/dt:.1f} fps", flush=True)

# ---- pass C: raw full_frame_step dispatch chain on a FROZEN map state
ms = slam2.ms
R, t = slam2.R_cw, slam2.t_cw
vR, vt = slam2.vel_R, slam2.vel_t
cam = cfg.camera
outs = None
t0 = time.time()
n = 50
for i in range(n):
    il, ir = frames[i % n_frames]
    out = tracking.full_frame_step(
        ms, il, ir, R, t, vR, vt, jnp.bool_(True), params,
        bf=cam.bf, w=W, h=H, scale=1.2, n_levels=8, n_features=1200,
        cell=32, min_inliers=10)
    ms = out[0]  # donated; keep chaining
jax.block_until_ready(out[2].n_inliers)
dt = (time.time() - t0) / n * 1e3
print(f"raw full_frame_step    : {dt:6.2f} ms/frame -> {1000/dt:.1f} fps", flush=True)

# ---- pass D: frontend only
t0 = time.time()
for i in range(n):
    il, ir = frames[i % n_frames]
    f = fe.process_stereo(il, ir, cam.bf, n_features=1200, n_levels=8,
                          scale=1.2, cell=32)
jax.block_until_ready(f.xy)
dt = (time.time() - t0) / n * 1e3
print(f"process_stereo only    : {dt:6.2f} ms/frame", flush=True)
