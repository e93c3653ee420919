"""Fused descriptor path with runtime-built weights (no giant literals)."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from orb_slam3_detailed_comments_kor_tpu.ops import orb as orb_ops
from orb_slam3_detailed_comments_kor_tpu.ops import pallas_gather as pg

PH, PW = orb_ops._PH, orb_ops._PW
T = orb_ops._BLUR_T
NB = orb_ops._N_BINS
K = 2432
rng = np.random.default_rng(0)
patches = jnp.asarray(rng.standard_normal((K, PH, PW)) * 40 + 120, jnp.float32)
bins_k = jnp.asarray(rng.integers(0, NB, K), jnp.int32)

BINLIN = orb_ops._BIN_LIN            # [NB,512] small int table
A_LIN = jnp.asarray(BINLIN[:, 0::2].reshape(-1))   # [NB*256]
B_LIN = jnp.asarray(BINLIN[:, 1::2].reshape(-1))
BR = jnp.asarray(orb_ops._BR)        # [48,39]
BC = jnp.asarray(orb_ops._BC)        # [45,39]
W_MOM = jnp.asarray(orb_ops._W_MOM)  # [2160,2]


def fused(p, bins):
    # blur+moments as one GEMM; weights built on device from small tables
    Wb = (BR[:, None, :, None] * BC[None, :, None, :]).reshape(PH * PW, T * T)
    Wbm = jnp.concatenate([Wb, W_MOM], axis=1).astype(jnp.bfloat16)
    pm = jax.lax.dot_general(
        p.reshape(K, PH * PW).astype(jnp.bfloat16), Wbm,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    mom = pm[:, T * T:]
    ang = jnp.arctan2(mom[:, 1], mom[:, 0])
    blurred = pm[:, :T * T].astype(jnp.bfloat16)
    Sd = (jax.nn.one_hot(A_LIN, T * T, dtype=jnp.bfloat16)
          - jax.nn.one_hot(B_LIN, T * T, dtype=jnp.bfloat16))  # [NB*256,1521]
    diff_all = jax.lax.dot_general(
        blurred, Sd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(K, NB, 256)
    pick = jax.nn.one_hot(bins, NB, dtype=jnp.float32)
    diff = jnp.einsum("kbs,kb->ks", diff_all, pick)
    return (diff < 0).astype(jnp.uint8), ang


f = jax.jit(fused)
t0 = time.time()
out = f(patches, bins_k)
jax.block_until_ready(out)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(30):
    out = f(patches, bins_k)
jax.block_until_ready(out)
print(f"FUSED: {(time.time()-t0)/30*1e3:.2f} ms", flush=True)
