"""Bisect per-frame device time: frontend vs track vs pose-opt budget."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam import frontend, map_state as msx, tracking

H, W = 480, 752
FX, BASELINE = 458.0, 0.11
params = jnp.array([FX, FX, W / 2.0, H / 2.0])
scene = synthetic.default_scene()
NREP = 20
Rs, ts = synthetic.make_trajectory(NREP, motion="strafe", speed=0.03)
frames = []
for i in range(NREP):
    il, ir, _ = synthetic.stereo_pair(
        params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
        h=H, w=W)
    frames.append((il.block_until_ready(), ir.block_until_ready()))

bf = BASELINE * FX

# --- frontend alone ---------------------------------------------------
f0 = frontend.process_stereo(frames[0][0], frames[0][1], bf,
                             n_features=1200, cell=32)
float(f0.xy[0, 0])
t0 = time.time()
img = frames[0][0]
for i in range(NREP):
    f = frontend.process_stereo(img, frames[i][1], bf,
                                n_features=1200, cell=32)
    img = frames[i][0] + 0.0 * f.xy[0, 0]  # chain: serialize executions
float(f.xy[0, 0])
dt_fe = (time.time() - t0) / NREP * 1e3
print(f"frontend process_stereo: {dt_fe:.2f} ms", flush=True)

# --- seed a map, then time full_frame_step ---------------------------
n_feat = f0.n
ms = msx.empty_map(64, n_feat, 16384)
ms = tracking.make_keyframe(
    ms, f0, jnp.eye(3), jnp.zeros(3), jnp.float32(0.0), jnp.int32(0),
    -jnp.ones((ms.L,), jnp.int32), params, float("inf"),
)
args = dict(bf=bf, w=W, h=H, scale=1.2, n_levels=8, n_features=1200,
            cell=32, min_inliers=10)
R = jnp.eye(3); t = jnp.zeros(3)
vR = jnp.eye(3); vt = jnp.zeros(3); hv = jnp.bool_(True)
out = tracking.full_frame_step(ms, frames[1][0], frames[1][1], R, t,
                               vR, vt, hv, params, **args)
float(out[3][0, 0])
ms2 = out[0]
t0 = time.time()
for i in range(2, 2 + 12):
    out = tracking.full_frame_step(ms2, frames[i % NREP][0],
                                   frames[i % NREP][1], out[3], out[4],
                                   out[5], out[6], hv, params, **args)
    ms2 = out[0]
float(out[3][0, 0])
dt_full = (time.time() - t0) / 12 * 1e3
print(f"full_frame_step: {dt_full:.2f} ms  (track part ~{dt_full-dt_fe:.2f})",
      flush=True)
