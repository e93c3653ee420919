"""True device throughput: chain N dependent steps, one readback at the end.

Through the axon tunnel, per-call wall time is dominated by RTT and
block_until_ready may return early, so the only reliable measure is a
data-dependent chain timed end-to-end with a single host sync.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam import (
    frontend, map_state as msx, tracking,
)

H, W = 480, 752
FX, BASELINE = 458.0, 0.11
params = jnp.array([FX, FX, W / 2.0, H / 2.0])
scene = synthetic.default_scene()
NREP = 32
Rs, ts = synthetic.make_trajectory(NREP, motion="strafe", speed=0.03)
frames = []
for i in range(NREP):
    il, ir, _ = synthetic.stereo_pair(
        params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
        h=H, w=W)
    frames.append((il.block_until_ready(), ir.block_until_ready()))
bf = BASELINE * FX


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def bench_chain(label, fn, n=NREP):
    # warm
    sync(fn(0, None))
    t0 = time.time()
    carry = None
    for i in range(n):
        carry = fn(i, carry)
    sync(carry)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:<28}: {dt:7.2f} ms/step", flush=True)


# 1. frontend only, chained via adding prev output's scalar into the image
def fe(i, carry):
    img = frames[i][0]
    if carry is not None:
        img = img + 0.0 * carry.xy[0, 0]
    f = frontend.process_stereo(img, frames[i][1], bf, n_features=1200,
                                cell=32)
    return f

bench_chain("frontend chained", fe)

# 2. full_frame_step chained through the map state (the real hot path)
f0 = frontend.process_stereo(frames[0][0], frames[0][1], bf,
                             n_features=1200, cell=32)
n_feat = f0.n
ms0 = msx.empty_map(64, n_feat, 16384)
ms0 = tracking.make_keyframe(
    ms0, f0, jnp.eye(3), jnp.zeros(3), jnp.float32(0.0), jnp.int32(0),
    -jnp.ones((ms0.L,), jnp.int32), params, float("inf"))
args = dict(bf=bf, w=W, h=H, scale=1.2, n_levels=8, n_features=1200,
            cell=32, min_inliers=30)
I3, Z3 = jnp.eye(3), jnp.zeros(3)


def ffs(i, carry):
    ms = ms0 if carry is None else carry[0]
    R, t = (I3, Z3) if carry is None else (carry[1], carry[2])
    out = tracking.full_frame_step(
        ms, frames[i][0], frames[i][1], R, t, I3, Z3, jnp.bool_(False),
        params, **args)
    return (out[0], out[3], out[4])


def sync2(c):
    return float(np.asarray(c[2]).ravel()[0])


sync2(ffs(0, None))
t0 = time.time()
carry = None
for i in range(NREP):
    carry = ffs(i, carry)
sync2(carry)
print(f"{'full_frame_step chained':<28}: "
      f"{(time.time() - t0) / NREP * 1e3:7.2f} ms/step", flush=True)
