"""Micro-profiler part 2: full_frame_step + per-KF programs, chained."""
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
bf = BASELINE * FX

il, ir, _ = synthetic.stereo_pair(
    params, jnp.eye(3), jnp.zeros(3), BASELINE, scene, h=H, w=W)
il, ir = il.block_until_ready(), ir.block_until_ready()

f0 = frontend.process_stereo(il, ir, bf, n_features=1200, cell=32)
n_feat = f0.n
ms0 = msx.empty_map(64, n_feat, 16384)
ms0 = tracking.make_keyframe(
    ms0, f0, jnp.eye(3), jnp.zeros(3), jnp.float32(0.0), jnp.int32(0),
    -jnp.ones((ms0.L,), jnp.int32), params, float("inf"))
ms0 = jax.block_until_ready(ms0)
args = dict(bf=bf, w=W, h=H, scale=1.2, n_levels=8, n_features=1200,
            cell=32, min_inliers=30)
I3, Z3 = jnp.eye(3), jnp.zeros(3)


def hsync(c):
    # through the axon tunnel only an actual device->host copy syncs
    leaf = [l for l in jax.tree.leaves(c) if hasattr(l, 'shape')][0]
    np.asarray(jax.numpy.ravel(leaf)[:1])


def fresh(c):
    return jax.tree.map(lambda x: jnp.copy(x) if hasattr(x, 'shape') else x, c)


def chain(label, step, carry0, n):
    hsync(step(fresh(carry0)))  # warm
    c = fresh(carry0)
    t0 = time.time()
    for _ in range(n):
        c = step(c)
    hsync(c)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:<36} n={n:<4}: {dt:8.3f} ms/step", flush=True)


def ffs(carry):
    ms, R, t = carry
    out = tracking.full_frame_step(
        ms, il, ir, R, t, I3, Z3, jnp.bool_(False), params, **args)
    return (out[0], out[3], out[4])

chain("full_frame_step", ffs, (ms0, I3, Z3), 24)
chain("full_frame_step", ffs, (ms0, I3, Z3), 48)


def lba(ms):
    return tracking.local_ba_step(
        ms, jnp.int32(0), params, bf, window=8, lm_cap=4096, iters=2,
        cam_model="pinhole", rig=None)

chain("local_ba_step w8 i2", lba, ms0, 12)

# keyframe insertion core program
def mk(ms):
    return tracking.make_keyframe(
        ms, f0, I3, Z3, jnp.float32(0.0), jnp.int32(1),
        -jnp.ones((ms.L,), jnp.int32), params, float("inf"))

chain("make_keyframe", mk, ms0, 12)

# ---- per-KF extras -------------------------------------------------------
from orb_slam3_detailed_comments_kor_tpu.models import vocabulary as voc
from orb_slam3_detailed_comments_kor_tpu.slam import loop_closing as lcx

vv = voc.load_default()
print(f"vocab: k={vv.k} depth={vv.depth} n_words={vv.n_words}")
db0 = jnp.zeros((64, vv.n_words))


def addkf(carry):
    db, = carry
    db = lcx._add_kf_core(db, jnp.int32(3), f0.desc, f0.valid,
                          vv.centroids, vv.idf, vv.k, vv.depth)
    return (db,)

chain("_add_kf_core (100k voc)", addkf, (db0,), 12)


def det(carry):
    ms, = carry
    cs = lcx._detect_core(db0, ms, jnp.int32(40), jnp.int32(41), 10)
    return (ms._replace(kf_t_cw=ms.kf_t_cw + 0.0 * cs[0, 1]),)

chain("_detect_core", det, (ms0,), 12)


def fuse_cull(carry):
    ms, = carry
    ms = tracking.fuse_duplicates(ms, jnp.int32(0), params, bf,
                                  cam_model="pinhole") if hasattr(tracking, "fuse_duplicates") else ms
    return (ms,)

def cull(carry):
    ms, = carry
    return (tracking.cull_landmarks(ms),)

chain("cull_landmarks", cull, (ms0,), 12)


def cullkf(carry):
    ms, = carry
    protect = jnp.zeros((ms.K,), bool).at[0].set(True)
    return (tracking.cull_redundant_keyframes(ms, protect),)

chain("cull_redundant_kf", cullkf, (ms0,), 12)
