"""Micro-bench the pallas patch gather + descriptor algebra pieces."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.ops import orb as orb_ops
from orb_slam3_detailed_comments_kor_tpu.ops import pallas_gather as pg

Hp, Wp = 480, 768
BNL = 16  # 2 views x 8 levels
K = 2432
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((BNL * Hp, Wp)), jnp.float32)
rows = jnp.asarray(rng.integers(0, BNL * Hp - 64, K), jnp.int32)
cols = jnp.asarray(rng.integers(0, Wp - 64, K), jnp.int32)

PH, PW = orb_ops._PH, orb_ops._PW


def bench(name, f, *a, n=30):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name:28s}: {(time.time()-t0)/n*1e3:7.2f} ms")
    return out


patches = bench("gather_patches (pallas)", jax.jit(
    lambda im, r, c: pg.gather_patches(im, r, c, PH, PW)), img, rows, cols)

# moment matmul
W_MOM = jnp.asarray(orb_ops._W_MOM)
bench("moments", jax.jit(lambda p: p.reshape(K, PH * PW) @ W_MOM), patches)

# blur
BR = jnp.asarray(orb_ops._BR)
BC = jnp.asarray(orb_ops._BC)


def blur(p):
    b = jnp.einsum("kiw,iu->kuw", p, BR)
    return jnp.einsum("kuw,wv->kuv", b, BC)


blurred = bench("blur einsums", jax.jit(blur), patches)
T = orb_ops._BLUR_T
bl = blurred.reshape(K, T * T)

# rBRIEF one-hot matmul
S = jax.nn.one_hot(jnp.asarray(orb_ops._BIN_LIN), T * T, dtype=jnp.bfloat16)


def brief(b):
    vals = jax.lax.dot_general(
        b.astype(jnp.bfloat16), S, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32)
    return vals


bench("rBRIEF one-hot matmul", jax.jit(brief), bl)

# ---- fused: blur+moments GEMM, then A-B diff rBRIEF GEMM ----
NB = orb_ops._N_BINS
BINLIN = orb_ops._BIN_LIN  # [NB,512]
W_bm = np.concatenate([
    np.kron(np.asarray(BR), np.asarray(BC)),       # [2160,1521]
    orb_ops._W_MOM,                                # [2160,2]
], axis=1).astype(np.float32)
W_bm_j = jnp.asarray(W_bm, jnp.bfloat16)
Sd = np.zeros((T * T, NB * 256), np.float32)
for b in range(NB):
    for s in range(256):
        Sd[BINLIN[b, 2 * s], b * 256 + s] += 1.0
        Sd[BINLIN[b, 2 * s + 1], b * 256 + s] -= 1.0
Sd_j = jnp.asarray(Sd, jnp.bfloat16)
bins_k = jnp.asarray(rng.integers(0, NB, K), jnp.int32)


def fused(p, bins):
    pm = jax.lax.dot_general(
        p.reshape(K, PH * PW).astype(jnp.bfloat16), W_bm_j,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    mom = pm[:, T * T:]
    ang = jnp.arctan2(mom[:, 1], mom[:, 0])
    blurred = pm[:, :T * T].astype(jnp.bfloat16)
    diff_all = jax.lax.dot_general(
        blurred, Sd_j, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(K, NB, 256)
    pick = jax.nn.one_hot(bins, NB, dtype=jnp.float32)
    diff = jnp.einsum("kbs,kb->ks", diff_all, pick)
    return (diff < 0).astype(jnp.uint8), ang


bench("FUSED blur+mom+brief+pick", jax.jit(fused), patches, bins_k, n=30)

# old full chain for comparison (mom + blur + brief + pick)
S_old = jax.nn.one_hot(jnp.asarray(BINLIN), T * T, dtype=jnp.bfloat16)


def old(p, bins):
    mom = p.reshape(K, PH * PW) @ W_MOM
    ang = jnp.arctan2(mom[:, 1], mom[:, 0])
    b = jnp.einsum("kiw,iu->kuw", p, BR)
    b = jnp.einsum("kuw,wv->kuv", b, BC).reshape(K, T * T)
    vals_all = jax.lax.dot_general(
        b.astype(jnp.bfloat16), S_old, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32)
    pick = jax.nn.one_hot(bins, NB, dtype=jnp.float32)
    vals = jnp.einsum("kbs,kb->ks", vals_all, pick).reshape(K, 256, 2)
    return (vals[..., 0] < vals[..., 1]).astype(jnp.uint8), ang


bench("OLD mom+blur+brief+pick", jax.jit(old), patches, bins_k, n=30)
