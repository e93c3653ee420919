"""Cumulative-stage bisection of the fused frontend program (stable mode,
varying inputs)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

float(jnp.array(1.0) + jnp.array(1.0))  # enter stable mode

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.ops import (
    fast as fast_ops, orb as orb_ops, pyramid as pyr_ops, select as sel_ops,
    stereo as stereo_ops,
)

H, W = 480, 752
FX, BASELINE = 458.0, 0.11
params = jnp.array([FX, FX, W / 2.0, H / 2.0])
scene = synthetic.default_scene()
NREP = 12
Rs, ts = synthetic.make_trajectory(NREP, motion="strafe", speed=0.03)
imgs_list = []
for i in range(NREP):
    il, ir, _ = synthetic.stereo_pair(
        params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
        h=H, w=W)
    imgs_list.append(jnp.stack([il, ir]).block_until_ready())

NL = 8
scale = 1.2
shapes = pyr_ops.level_shapes(H, W, NL, scale)
budgets = orb_ops.level_budgets(1200, NL, scale)
K0 = max(budgets)
hs = np.array([s[0] for s in shapes], np.int32)
ws = np.array([s[1] for s in shapes], np.int32)


def upto(stage):
    def f(imgs):
        B = 2
        levels = [imgs]
        for l in range(1, NL):
            levels.append(jax.image.resize(
                levels[-1], (B,) + shapes[l], method="linear", antialias=True))
        stack = jnp.stack([
            jnp.pad(lv, ((0, 0), (0, H - s[0]), (0, W - s[1])))
            for lv, s in zip(levels, shapes)], axis=1)
        flat = stack.reshape(B * NL, H, W)
        if stage == "pyramid":
            return flat
        yy = jax.lax.broadcasted_iota(jnp.int32, (NL, H, W), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (NL, H, W), 2)
        hs_j = jnp.asarray(hs)[:, None, None]
        ws_j = jnp.asarray(ws)[:, None, None]
        inb3 = (yy >= 3) & (yy < hs_j - 3) & (xx >= 3) & (xx < ws_j - 3)
        inbB = ((yy >= 19) & (yy < hs_j - 19) & (xx >= 19) & (xx < ws_j - 19))
        tile = lambda m: jnp.broadcast_to(m[None], (B, NL, H, W)).reshape(
            B * NL, H, W)
        score, raw_lo = fast_ops.fast_with_fallback_stack(
            flat, 20.0, 7.0, 32, tile(inb3))
        score = jnp.where(tile(inbB), score, 0.0)
        if stage == "fast":
            return score, raw_lo
        xyf, respf, validf = jax.vmap(
            lambda s: sel_ops.select_keypoints(s, K0, cell=32, border=0)
        )(score)
        if stage == "select":
            return xyf, respf, validf, raw_lo
        sel_idx = np.concatenate(
            [l * K0 + np.arange(b) for l, b in enumerate(budgets)])
        lvl_static = np.concatenate(
            [np.full(b, l, np.int32) for l, b in enumerate(budgets)])
        N = sel_idx.size
        xy = xyf.reshape(B, NL * K0, 2)[:, sel_idx]
        valid = validf.reshape(B, NL * K0)[:, sel_idx]
        lvl_b = jnp.broadcast_to(jnp.asarray(lvl_static)[None], (B, N))
        flat_idx = (jnp.broadcast_to(jnp.arange(B)[:, None], (B, N)) * NL
                    + lvl_b).reshape(B * N)
        xk = xy[..., 0].reshape(B * N)
        yk = xy[..., 1].reshape(B * N)
        row0 = flat_idx * H + yk
        r = 15
        flat2d = flat.reshape(B * NL * H, W)
        dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
        circ = (dx * dx + dy * dy) <= r * r
        patches = flat2d[row0[:, None, None] + jnp.asarray(dy)[None],
                         xk[:, None, None] + jnp.asarray(dx)[None]]
        wp = jnp.where(jnp.asarray(circ), patches, 0.0)
        m10 = jnp.sum(wp * jnp.asarray(dx, np.float32), axis=(1, 2))
        m01 = jnp.sum(wp * jnp.asarray(dy, np.float32), axis=(1, 2))
        ang = jnp.arctan2(m01, m10)
        if stage == "orient":
            return ang
        blur = pyr_ops.gaussian_blur(flat, 7, 2.0)
        blur2d = blur.reshape(B * NL * H, W)
        pat = jnp.asarray(orb_ops._PATTERN, dtype=jnp.float32)
        ppx = jnp.stack([pat[:, 0], pat[:, 2]], axis=-1)
        ppy = jnp.stack([pat[:, 1], pat[:, 3]], axis=-1)
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        pcol = jnp.round(ppx[None] * ca[:, None, None]
                         - ppy[None] * sa[:, None, None]).astype(jnp.int32)
        prow = jnp.round(ppx[None] * sa[:, None, None]
                         + ppy[None] * ca[:, None, None]).astype(jnp.int32)
        vals = blur2d[row0[:, None, None] + prow, xk[:, None, None] + pcol]
        desc = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)
        if stage == "desc":
            return desc
        raise ValueError(stage)
    return jax.jit(f)


def pipe(name, f, n=NREP):
    out = f(imgs_list[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(n):
        out = f(imgs_list[i % len(imgs_list)])
    jax.block_until_ready(out)
    print(f"{name:22s}: {(time.time()-t0)/n*1e3:7.2f} ms", flush=True)


for st in ["pyramid", "fast", "select", "orient", "desc"]:
    pipe(f"upto {st}", upto(st))

from orb_slam3_detailed_comments_kor_tpu.slam import frontend as fe
pipe("process_stereo", lambda x: fe.process_stereo(
    x[0], x[1], BASELINE * FX, n_features=1200, n_levels=8, scale=1.2,
    cell=32))
pipe("extract_orb_batch", lambda x: orb_ops.extract_orb_batch(x))
