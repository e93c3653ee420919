"""Bisect the PRODUCTION frontend (extract_orb_batch path incl. pallas
patch-DMA) by cumulative stage, on the current backend.

Replicates extract_orb_batch's body with a stage cut so each returned
program is exactly the production prefix.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.ops import (
    fast as fast_ops, orb as orb_ops, pallas_gather as pg,
    pyramid as pyr_ops, select as sel_ops,
)
from orb_slam3_detailed_comments_kor_tpu.slam import frontend

H, W = 480, 752
FX, BASELINE = 458.0, 0.11
NREP = 16
params = jnp.array([FX, FX, W / 2.0, H / 2.0])
scene = synthetic.default_scene()
Rs, ts = synthetic.make_trajectory(NREP, motion="strafe", speed=0.03)
imgs_list = []
for i in range(NREP):
    il, ir, _ = synthetic.stereo_pair(
        params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
        h=H, w=W)
    imgs_list.append(jnp.stack([il, ir]).block_until_ready())

NL, scale, cell = 8, 1.2, 32
n_features = 1200
ini_th, min_th = 20.0, 7.0


@functools.partial(jax.jit, static_argnames=("stage",))
def upto(imgs, stage: str):
    B = imgs.shape[0]
    shapes = pyr_ops.level_shapes(H, W, NL, scale)
    budgets = orb_ops.level_budgets(n_features, NL, scale)
    K0 = max(budgets)
    levels = [imgs]
    for l in range(1, NL):
        levels.append(jax.image.resize(
            levels[-1], (B,) + shapes[l], method="linear", antialias=True))
    Hp = ((H + 7) // 8) * 8
    Wp = ((W + 127) // 128) * 128
    stack = jnp.stack([
        jnp.pad(lv, ((0, 0), (0, Hp - s[0]), (0, Wp - s[1])))
        for lv, s in zip(levels, shapes)], axis=1)
    flat = stack.reshape(B * NL, Hp, Wp)
    if stage == "pyramid":
        return flat
    hs = np.array([s[0] for s in shapes], np.int32)
    ws = np.array([s[1] for s in shapes], np.int32)
    yy = jax.lax.broadcasted_iota(jnp.int32, (NL, Hp, Wp), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (NL, Hp, Wp), 2)
    hs_j = jnp.asarray(hs)[:, None, None]
    ws_j = jnp.asarray(ws)[:, None, None]
    inb3 = (yy >= 3) & (yy < hs_j - 3) & (xx >= 3) & (xx < ws_j - 3)
    inbB = ((yy >= orb_ops.BORDER) & (yy < hs_j - orb_ops.BORDER)
            & (xx >= orb_ops.BORDER) & (xx < ws_j - orb_ops.BORDER))
    tile = lambda m: jnp.broadcast_to(m[None], (B, NL, Hp, Wp)).reshape(
        B * NL, Hp, Wp)
    score, raw_lo = fast_ops.fast_with_fallback_stack(
        flat, ini_th, min_th, cell, tile(inb3))
    score = jnp.where(tile(inbB), score, 0.0)
    if stage == "fast":
        return score
    xyf, respf, validf = jax.vmap(
        lambda s: sel_ops.select_keypoints(s, K0, cell=cell, border=0))(score)
    sel_idx = np.concatenate(
        [l * K0 + np.arange(b) for l, b in enumerate(budgets)])
    lvl_static = np.concatenate(
        [np.full(b, l, np.int32) for l, b in enumerate(budgets)])
    N = sel_idx.size
    xy = xyf.reshape(B, NL * K0, 2)[:, sel_idx]
    resp = respf.reshape(B, NL * K0)[:, sel_idx]
    valid = validf.reshape(B, NL * K0)[:, sel_idx]
    if stage == "select":
        return xy, resp, valid
    lvl_b = jnp.broadcast_to(jnp.asarray(lvl_static)[None], (B, N))
    flat_idx = (jnp.broadcast_to(jnp.arange(B)[:, None], (B, N)) * NL
                + lvl_b).reshape(B * N)
    xk = xy[..., 0].reshape(B * N)
    yk = xy[..., 1].reshape(B * N)
    row0 = flat_idx * Hp + yk
    flat2d = flat.reshape(B * NL * Hp, Wp)
    patches = pg.gather_patches(
        flat2d, row0 - orb_ops._PC, xk - orb_ops._PC, orb_ops._PH,
        orb_ops._PW)
    if stage == "patches":
        return patches
    mom = patches.reshape(B * N, orb_ops._PH * orb_ops._PW) @ jnp.asarray(
        orb_ops._W_MOM)
    ang = jnp.arctan2(mom[:, 1], mom[:, 0])
    blurred = jnp.einsum("kiw,iu->kuw", patches, jnp.asarray(orb_ops._BR))
    blurred = jnp.einsum(
        "kuw,wv->kuv", blurred, jnp.asarray(orb_ops._BC)
    ).reshape(B * N, orb_ops._BLUR_T * orb_ops._BLUR_T)
    if stage == "blur":
        return blurred, ang
    bins = jnp.mod(
        jnp.round(ang * (orb_ops._N_BINS / (2.0 * jnp.pi))).astype(jnp.int32),
        orb_ops._N_BINS)
    S = jax.nn.one_hot(
        jnp.asarray(orb_ops._BIN_LIN), orb_ops._BLUR_T * orb_ops._BLUR_T,
        dtype=jnp.bfloat16)
    vals_all = jax.lax.dot_general(
        blurred.astype(jnp.bfloat16), S, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32)
    pick = jax.nn.one_hot(bins, orb_ops._N_BINS, dtype=jnp.float32)
    vals = jnp.einsum("kbs,kb->ks", vals_all, pick).reshape(B * N, 256, 2)
    desc = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)
    if stage == "desc":
        return desc
    raw2d = raw_lo.reshape(B * NL * Hp, Wp)
    sc = raw2d[row0, xk]
    sl = raw2d[row0, xk - 1]
    sr = raw2d[row0, xk + 1]
    su = raw2d[row0 - 1, xk]
    sd = raw2d[row0 + 1, xk]
    return desc, sc, sl, sr, su, sd


def bench(label, fn):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(i) for i in range(NREP)]
    for o in outs:
        jax.block_until_ready(o)
    dt = (time.time() - t0) / NREP * 1e3
    print(f"{label:<22}: {dt:7.2f} ms", flush=True)


for st in ["pyramid", "fast", "select", "patches", "blur", "desc",
           "subpixel"]:
    bench(f"upto {st}", lambda i, st=st: upto(imgs_list[i], st))

bench("process_stereo", lambda i: frontend.process_stereo(
    imgs_list[i][0], imgs_list[i][1], BASELINE * FX, n_features=n_features,
    cell=cell))
