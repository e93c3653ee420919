"""Throughput-style timing: enqueue M programs, then drain all outputs."""
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
NREP = 24
Rs, ts = synthetic.make_trajectory(NREP, motion="strafe", speed=0.03)
frames = []
for i in range(NREP):
    il, ir, _ = synthetic.stereo_pair(
        params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
        h=H, w=W)
    frames.append((il.block_until_ready(), ir.block_until_ready()))
bf = BASELINE * FX


def bench(label, fn):
    out = fn(0)
    np.asarray(jax.tree.leaves(out)[0])  # warm + sync
    t0 = time.time()
    outs = [fn(i) for i in range(NREP)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0])
    dt = (time.time() - t0) / NREP * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)
    return outs[0]


f0 = bench("frontend", lambda i: frontend.process_stereo(
    frames[i][0], frames[i][1], bf, n_features=1200, cell=32))

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

state = {"ms": ms}


def step(i):
    out = tracking.full_frame_step(state["ms"], frames[i][0], frames[i][1],
                                   R, t, vR, vt, hv, params, **args)
    state["ms"] = out[0]
    return out[2].n_inliers

bench("full_frame_step", step)

# track only (re-jit a track_frame-only program)
f_fixed = f0
@jax.jit
def track_only(ms_, R_, t_):
    return tracking.track_frame.__wrapped__(
        ms_, f_fixed, R_, t_, params, bf, W, H, 1.2, 8).n_inliers

bench("track_frame only", lambda i: track_only(state["ms"], R, t))
