"""Micro-profiler: dispatch overhead vs device time for every hot program
(consolidates the former prof_micro{,2,3}.py scratch scripts into one tool).

Method: each program is run as a data-dependent chain of n steps with ONE
host sync at the end — through the axon tunnel a per-step sync costs a full
RTT (~25 ms), so chaining is the only way to see device time. Comparing two
chain lengths separates dispatch-bound (constant per step) from
device-bound (scales with work) programs.

Sections (args): dispatch frontend track kf inertial vio. Default: all.
Run on the chip: python tools/prof_micro.py [section ...]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.ops import imu as imu_ops
from orb_slam3_detailed_comments_kor_tpu.slam import (
    frontend, inertial, map_state as msx, tracking,
)

H, W = 480, 752
FX, BASELINE = 458.0, 0.11
params = jnp.array([FX, FX, W / 2.0, H / 2.0])
scene = synthetic.default_scene()
bf = BASELINE * FX
I3, Z3 = jnp.eye(3), jnp.zeros(3)
grav = jnp.array([0.0, 0.0, -9.81])
R_cb, t_cb = jnp.eye(3), jnp.zeros(3)

il, ir, _ = synthetic.stereo_pair(
    params, jnp.eye(3), jnp.zeros(3), BASELINE, scene, h=H, w=W)
il, ir = il.block_until_ready(), ir.block_until_ready()

f0 = frontend.process_stereo(il, ir, bf, n_features=1200, cell=32)
ms0 = msx.empty_map(64, f0.n, 16384)
ms0 = tracking.make_keyframe(
    ms0, f0, jnp.eye(3), jnp.zeros(3), jnp.float32(0.0), jnp.int32(0),
    -jnp.ones((ms0.L,), jnp.int32), params, float("inf"))
ms0 = jax.block_until_ready(ms0)
ikf0 = inertial.empty_inertial(64)
ARGS = dict(bf=bf, w=W, h=H, scale=1.2, n_levels=8, n_features=1200,
            cell=32, min_inliers=30)


def hsync(c):
    # through the axon tunnel only an actual device->host copy syncs
    leaf = [l for l in jax.tree.leaves(c) if hasattr(l, "shape")][0]
    np.asarray(jnp.ravel(leaf)[:1])


def fresh(c):
    return jax.tree.map(
        lambda x: jnp.copy(x) if hasattr(x, "shape") else x, c
    )


def chain(label, step, carry0, n):
    hsync(step(fresh(carry0)))  # warm/compile
    c = fresh(carry0)
    t0 = time.time()
    for _ in range(n):
        c = step(c)
    hsync(c)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:<40} n={n:<4}: {dt:8.3f} ms/step", flush=True)
    return dt


# ---------------------------------------------------------------------------
def sec_dispatch():
    @jax.jit
    def triv(x):
        return x + 1.0

    chain("trivial add", triv, il, 64)

    A = jnp.zeros((2048, 2048), jnp.bfloat16)

    @jax.jit
    def mm(x):
        y = (A + x[0, 0].astype(jnp.bfloat16)) @ A
        return y.astype(jnp.float32)[:H, :W]

    chain("2k bf16 matmul", mm, il, 32)


def sec_frontend():
    def fe(x):
        f = frontend.process_stereo(x, ir, bf, n_features=1200, cell=32)
        return x + 0.0 * f.xy[0, 0]

    chain("process_stereo", fe, il, 24)

    from orb_slam3_detailed_comments_kor_tpu.ops import orb as orb_ops

    def ex(x):
        kp, desc, ang, lvl, valid = orb_ops.extract(
            x, n_features=1200, n_levels=8, scale=1.2, cell=32)
        return x + 0.0 * kp[0, 0]

    chain("orb.extract (one view)", ex, il, 24)


def sec_track():
    def ffs(carry):
        ms, R, t = carry
        out = tracking.full_frame_step(
            ms, il, ir, R, t, I3, Z3, jnp.bool_(False), params, **ARGS)
        return (out[0], out[3], out[4])

    chain("full_frame_step", ffs, (ms0, I3, Z3), 24)

    def lba(ms):
        return tracking.local_ba_step(
            ms, jnp.int32(0), params, bf, window=8, lm_cap=4096, iters=2,
            cam_model="pinhole", rig=None)

    chain("local_ba_step w8 i2", lba, ms0, 12)


def sec_kf():
    def mk(ms):
        return tracking.make_keyframe(
            ms, f0, I3, Z3, jnp.float32(0.0), jnp.int32(1),
            -jnp.ones((ms.L,), jnp.int32), params, float("inf"))

    chain("make_keyframe", mk, ms0, 12)

    def cull(carry):
        (ms,) = carry
        return (tracking.cull_landmarks(ms),)

    chain("cull_landmarks", cull, (ms0,), 12)

    def tri(carry):
        (ms,) = carry
        feat_b, X_w, want, nb = tracking.triangulate_with_neighbor(
            ms, jnp.int32(0), params, w=W, h=H)
        return (ms._replace(kf_t_cw=ms.kf_t_cw + 0.0 * X_w[0, 0]),)

    chain("triangulate_with_neighbor", tri, (ms0,), 8)

    from orb_slam3_detailed_comments_kor_tpu.models import vocabulary as voc
    from orb_slam3_detailed_comments_kor_tpu.slam import loop_closing as lcx

    vv = voc.load_default()
    dbw0 = jnp.full((64, voc.TOPW), -1, jnp.int32)
    dbt0 = jnp.zeros((64, voc.TOPW))

    def addkf(carry):
        dbw, dbt = carry
        return lcx._add_kf_core(dbw, dbt, jnp.int32(3), f0.desc, f0.valid,
                                vv.centroids, vv.idf, vv.k, vv.depth)

    chain("_add_kf_core (sparse db)", addkf, (dbw0, dbt0), 12)

    def det(carry):
        (ms,) = carry
        cs = lcx._detect_core(dbw0, dbt0, ms, jnp.int32(40), jnp.int32(41),
                              10)
        return (ms._replace(kf_t_cw=ms.kf_t_cw + 0.0 * cs[0, 1]),)

    chain("_detect_core", det, (ms0,), 12)


def _imu_batch(cap=16, n=10):
    acc = np.tile([0.0, 0.0, 9.81], (cap, 1)).astype(np.float32)
    gyro = np.zeros((cap, 3), np.float32)
    dt = np.full((cap,), 0.005, np.float32)
    return imu_ops.ImuBatch(
        acc=jnp.asarray(acc), gyro=jnp.asarray(gyro), dt=jnp.asarray(dt),
        valid=jnp.arange(cap) < n,
    )


def sec_inertial():
    batch = _imu_batch(64, 10)
    pre0 = imu_ops.identity_preintegrated()

    def adv(carry):
        pre_run, R, t = carry
        seg, run, R_pred, t_pred, v2 = inertial.advance_imu(
            batch, Z3, Z3, 1e-3, 1e-2, pre_run, R, t, Z3, grav, R_cb, t_cb)
        return (run, R_pred, t_pred)

    chain("advance_imu (fused int+comp+pred)", adv, (pre0, I3, Z3), 32)

    def lviba(carry):
        ms, ikf = carry
        ms, ikf, _ = inertial.local_vi_ba_step(
            ms, ikf, jnp.int32(0), grav, params, R_cb, t_cb, bf,
            window=10, lm_cap=4096, iters=2, cam_model="pinhole", rig=None)
        return (ms, ikf)

    chain("local_vi_ba_step w10 i2", lviba, (ms0, ikf0), 10)

    def lviba16(carry):
        ms, ikf = carry
        ms, ikf, _ = inertial.local_vi_ba_step(
            ms, ikf, jnp.int32(0), grav, params, R_cb, t_cb, bf,
            window=16, lm_cap=4096, iters=2, cam_model="pinhole", rig=None)
        return (ms, ikf)

    chain("local_vi_ba_step w16 i2 (fiba win)", lviba16, (ms0, ikf0), 8)

    def fiba(carry):
        ms, ikf = carry
        ms, ikf, cost = inertial.full_inertial_ba(
            ms, ikf, grav, params, R_cb, t_cb, bf, iters=2,
            cam_model="pinhole", rig=None)
        return (ms, ikf)

    chain("full_inertial_ba i2 (K=64)", fiba, (ms0, ikf0), 6)


def sec_vio():
    from orb_slam3_detailed_comments_kor_tpu.optim import vio

    batch = _imu_batch(16, 10)
    pre = imu_ops.integrate_j(batch, Z3, Z3, 1e-3, 1e-2)
    prior = vio.kf_prior(I3, Z3, Z3, Z3, Z3, R_cb, t_cb)
    lm_feat = jnp.where(
        jnp.arange(ms0.L) < 800, jnp.arange(ms0.L) % f0.n, -1
    ).astype(jnp.int32)
    lm_inlier = lm_feat >= 0

    def vstep(carry):
        prior, R, t = carry
        R2, t2, cur, nxt, n_in = vio.vio_frame_step(
            ms0.lm_pos, lm_feat, lm_inlier,
            f0.xy, f0.u_right, f0.level, None,
            R, t, prior, pre,
            params, R_cb, t_cb, grav, None,
            bf=bf, scale=1.2, cam_model="pinhole", min_inliers=15)
        return (nxt, R2, t2)

    chain("vio_frame_step (standalone)", vstep, (prior, I3, Z3), 24)


SECTIONS = {
    "dispatch": sec_dispatch,
    "frontend": sec_frontend,
    "track": sec_track,
    "kf": sec_kf,
    "inertial": sec_inertial,
    "vio": sec_vio,
}

if __name__ == "__main__":
    which = sys.argv[1:] or list(SECTIONS)
    print(f"platform: {jax.devices()[0].platform}")
    for s in which:
        print(f"--- {s} ---", flush=True)
        SECTIONS[s]()
