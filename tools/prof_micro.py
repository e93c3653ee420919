"""Micro-profiler: separate dispatch overhead from device time per program.

For each candidate program we measure
  - chain-N wall time (data-dependent chain, one sync at the end)
  - the same with 2N to see how it scales (device-bound scales linearly;
    dispatch-bound stays constant per step)
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
bf = BASELINE * FX

il, ir, _ = synthetic.stereo_pair(
    params, jnp.eye(3), jnp.zeros(3), BASELINE, scene, h=H, w=W)
il, ir = il.block_until_ready(), ir.block_until_ready()


def chain(label, step, n):
    out = step(il)  # warm/compile
    jax.block_until_ready(out)
    t0 = time.time()
    x = il
    for _ in range(n):
        x = step(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:<36} n={n:<4}: {dt:8.3f} ms/step", flush=True)
    return dt


# 0. trivial op — measures pure dispatch/chain overhead
@jax.jit
def triv(x):
    return x + 1.0

chain("trivial add", triv, 32)
chain("trivial add", triv, 256)


# 0b. ~1ms-scale matmul
A = jnp.zeros((2048, 2048), jnp.bfloat16)
@jax.jit
def mm(x):
    y = (A + x[0, 0].astype(jnp.bfloat16)) @ A
    return y.astype(jnp.float32)[:H, :W]

chain("2k bf16 matmul", mm, 32)

# 1. frontend
def fe(x):
    f = frontend.process_stereo(x, ir, bf, n_features=1200, cell=32)
    return x + 0.0 * f.xy[0, 0]

chain("process_stereo", fe, 16)
chain("process_stereo", fe, 48)

# 1b. frontend pieces
from orb_slam3_detailed_comments_kor_tpu.ops import orb as orb_ops
def ex(x):
    kp, desc, ang, lvl, valid = orb_ops.extract(
        x, n_features=1200, n_levels=8, scale=1.2, cell=32)
    return x + 0.0 * kp[0, 0]

chain("orb.extract (one view)", ex, 16)
chain("orb.extract (one view)", ex, 48)
