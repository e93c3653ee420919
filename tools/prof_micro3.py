"""Micro-profiler part 3: inertial-path programs on the chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam import (
    frontend, inertial, map_state as msx, tracking,
)

H, W = 480, 752
FX, BASELINE = 458.0, 0.11
params = jnp.array([FX, FX, W / 2.0, H / 2.0])
scene = synthetic.default_scene()
bf = BASELINE * FX

il, ir, _ = synthetic.stereo_pair(
    params, jnp.eye(3), jnp.zeros(3), BASELINE, scene, h=H, w=W)
f0 = frontend.process_stereo(il, ir, bf, n_features=1200, cell=32)
ms0 = msx.empty_map(64, f0.n, 16384)
ms0 = tracking.make_keyframe(
    ms0, f0, jnp.eye(3), jnp.zeros(3), jnp.float32(0.0), jnp.int32(0),
    -jnp.ones((ms0.L,), jnp.int32), params, float("inf"))
ikf0 = inertial.empty_inertial(64)
I3, Z3 = jnp.eye(3), jnp.zeros(3)
grav = jnp.array([0.0, 0.0, -9.81])
R_cb, t_cb = jnp.eye(3), jnp.zeros(3)


def hsync(c):
    leaf = [l for l in jax.tree.leaves(c) if hasattr(l, 'shape')][0]
    np.asarray(jnp.ravel(leaf)[:1])


def fresh(c):
    return jax.tree.map(lambda x: jnp.copy(x) if hasattr(x, 'shape') else x, c)


def chain(label, step, carry0, n):
    hsync(step(fresh(carry0)))
    c = fresh(carry0)
    t0 = time.time()
    for _ in range(n):
        c = step(c)
    hsync(c)
    print(f"{label:<36} n={n:<4}: {(time.time()-t0)/n*1e3:8.3f} ms/step",
          flush=True)


def lviba(carry):
    ms, ikf = carry
    ms, ikf, _ = inertial.local_vi_ba_step(
        ms, ikf, jnp.int32(0), grav, params, R_cb, t_cb, bf,
        window=10, lm_cap=4096, iters=2, cam_model="pinhole", rig=None)
    return (ms, ikf)

chain("local_vi_ba_step w10 i2", lviba, (ms0, ikf0), 10)


def fiba(carry):
    ms, ikf = carry
    ms, ikf, cost = inertial.full_inertial_ba(
        ms, ikf, grav, params, R_cb, t_cb, bf, iters=2,
        cam_model="pinhole", rig=None)
    return (ms, ikf)

chain("full_inertial_ba i2 (K=64)", fiba, (ms0, ikf0), 6)


def fiba6(carry):
    ms, ikf = carry
    ms, ikf, cost = inertial.full_inertial_ba(
        ms, ikf, grav, params, R_cb, t_cb, bf, iters=6,
        cam_model="pinhole", rig=None)
    return (ms, ikf)

chain("full_inertial_ba i6 (K=64)", fiba6, (ms0, ikf0), 3)


# dense whole-map variants as GBA chunk candidates (K=64 bench scale)
def lviba_full(carry):
    ms, ikf = carry
    ms, ikf, _ = inertial.local_vi_ba_step(
        ms, ikf, jnp.int32(63), grav, params, R_cb, t_cb, bf,
        window=64, lm_cap=8192, iters=2, cam_model="pinhole", rig=None)
    return (ms, ikf)

chain("local_vi_ba w64 lm8k i2", lviba_full, (ms0, ikf0), 4)


def fiba_cg8(carry):
    ms, ikf = carry
    from orb_slam3_detailed_comments_kor_tpu.optim import vi_ba
    ms, ikf, cost = inertial.full_inertial_ba(
        ms, ikf, grav, params, R_cb, t_cb, bf, iters=1,
        cam_model="pinhole", rig=None)
    return (ms, ikf)

chain("full_inertial_ba i1 cg24", fiba_cg8, (ms0, ikf0), 4)
