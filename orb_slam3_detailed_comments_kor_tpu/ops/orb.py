"""Batched ORB feature extraction: pyramid FAST + orientation + rBRIEF.

TPU-native counterpart of ``ORBextractor::operator()`` (reference
``src/ORBextractor.cc:1068-1150``): 8-level pyramid, FAST with high/low
threshold fallback, spatially-uniform selection (see ``select.py``),
intensity-centroid orientation (``IC_Angle``, ``ORBextractor.cc:75``) and
256-bit rotated BRIEF using the canonical ORB sampling pattern
(``bit_pattern_31_``, a public learned constant from Rublee et al. 2011,
stored as the binary asset ``orb_pattern.npy``).

Everything is one jitted function per (image-shape, config): all levels are
processed with static shapes and fixed per-level budgets; invalid slots are
masked.  Output coordinates are level-0 pixels; descriptors are kept both
bit-unpacked ([N,256] uint8 in {0,1}) — the layout the MXU Hamming matcher
wants — and packed ([N,8] uint32) for compact storage.
"""

from __future__ import annotations

import functools
import os
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.ops import fast as fast_ops
from orb_slam3_detailed_comments_kor_tpu.ops import pallas_fast
from orb_slam3_detailed_comments_kor_tpu.ops import pallas_gather as pg
from orb_slam3_detailed_comments_kor_tpu.ops import pyramid as pyr_ops
from orb_slam3_detailed_comments_kor_tpu.ops import select as sel_ops

_PATTERN = np.load(os.path.join(os.path.dirname(__file__), "orb_pattern.npy"))
HALF_PATCH = 15  # orientation patch radius (reference ORBextractor.cc:71)
BORDER = 19      # EDGE_THRESHOLD (reference ORBextractor.cc:72)

# ---------------------------------------------------------------------------
# Per-keypoint patch pipeline constants.
#
# One [48,45] unblurred patch is gathered per keypoint (rows r0-22..r0+25,
# cols c0-22..c0+22; keypoints sit >= BORDER=19 px from their level's edge so
# the +-22 window leaves the level by at most 3 px of padding). Everything
# sparse then becomes dense linear algebra over the patch block:
#   - IC orientation = one [K,2160]x[2160,2] matmul (moment weights),
#   - the 7x7 Gaussian blur = two small band-matrix matmuls,
#   - rBRIEF = per-angle-bin 0/1 selection matmuls (the ORB paper quantizes
#     the steering angle to 2*pi/30 precisely so samples can be table-driven;
#     Rublee et al. 2011 sec. 4.3 — reference ORBextractor.cc:106 keeps the
#     continuous angle, the 12-degree bin is the paper's own discretisation).
# All of this rides the MXU; the only gathers left are the patch DMAs
# (pallas_gather) and a 5-scalar subpixel read, removing the ~40 ms/frame
# of XLA gather HLOs measured on this runtime.
# ---------------------------------------------------------------------------
_PH, _PW, _PC = 48, 45, 22      # patch rows/cols and center index
_BLUR_T = 39                     # blurred interior size (+-19)
# rBRIEF steering-angle bins. The ORB paper discretises to 2*pi/30 (12 deg);
# we use 96 bins (3.75 deg) — still a table-driven matmul, and the finer
# steering measurably reduces map drift vs the paper's 30 on the synthetic
# suite (the reference keeps the continuous angle, ORBextractor.cc:106).
_N_BINS = 96


def _moment_weights() -> np.ndarray:
    """[_PH*_PW, 2] weights: m10/m01 over the centred 31x31 disc."""
    w = np.zeros((_PH, _PW, 2), np.float32)
    r = HALF_PATCH
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
    circ = (dx * dx + dy * dy) <= r * r
    w[_PC - r:_PC + r + 1, _PC - r:_PC + r + 1, 0] = np.where(circ, dx, 0)
    w[_PC - r:_PC + r + 1, _PC - r:_PC + r + 1, 1] = np.where(circ, dy, 0)
    return w.reshape(_PH * _PW, 2)


def _blur_bands(ksize: int = 7, sigma: float = 2.0):
    """Band matrices (BR [_PH,_BLUR_T], BC [_PW,_BLUR_T]) implementing the
    separable Gaussian so blurred[u,v] = sum BR[i,u]*patch[i,j]*BC[j,v],
    where blurred index u maps to patch row u+3 (the +-19 interior)."""
    x = np.arange(ksize) - (ksize - 1) / 2
    g = np.exp(-(x * x) / (2 * sigma * sigma)).astype(np.float32)
    g /= g.sum()
    br = np.zeros((_PH, _BLUR_T), np.float32)
    bc = np.zeros((_PW, _BLUR_T), np.float32)
    for u in range(_BLUR_T):
        for t in range(ksize):
            br[u + t, u] = g[t]
            bc[u + t, u] = g[t]
    return br, bc


def _bin_sample_lin() -> np.ndarray:
    """[_N_BINS, 512] linear indices into the [39,39] blurred patch: the
    rBRIEF pattern rotated by each bin's angle, rounded to integer pixels
    (computeOrbDescriptor semantics at the paper's 12-degree steering)."""
    pat = _PATTERN.astype(np.float64)  # [256,4] x1 y1 x2 y2
    px = np.stack([pat[:, 0], pat[:, 2]], -1)  # [256,2]
    py = np.stack([pat[:, 1], pat[:, 3]], -1)
    out = np.zeros((_N_BINS, 512), np.int32)
    c = _BLUR_T // 2  # 19
    for b in range(_N_BINS):
        th = 2.0 * np.pi * b / _N_BINS
        ca, sa = np.cos(th), np.sin(th)
        col = np.clip(np.round(px * ca - py * sa).astype(np.int64) + c, 0, _BLUR_T - 1)
        row = np.clip(np.round(px * sa + py * ca).astype(np.int64) + c, 0, _BLUR_T - 1)
        lin = row * _BLUR_T + col            # [256,2]
        out[b] = lin.reshape(-1)             # s = 2*j + t
    return out


_W_MOM = _moment_weights()
_BR, _BC = _blur_bands()
_BIN_LIN = _bin_sample_lin()


class Features(NamedTuple):
    """Fixed-capacity feature set for one image. All arrays length N."""

    xy: jnp.ndarray        # [N,2] float32, level-0 pixel coords (x, y)
    response: jnp.ndarray  # [N] float32
    angle: jnp.ndarray     # [N] float32 radians
    level: jnp.ndarray     # [N] int32 pyramid level
    desc: jnp.ndarray      # [N,256] uint8 in {0,1}
    valid: jnp.ndarray     # [N] bool

    @property
    def n(self) -> int:
        return self.xy.shape[0]


def level_budgets(n_features: int, n_levels: int, scale: float) -> List[int]:
    """Per-level feature budgets, geometric in 1/scale (reference
    ORBextractor ctor, ``src/ORBextractor.cc:1108-1151`` region)."""
    f = 1.0 / scale
    base = n_features * (1 - f) / (1 - f ** n_levels)
    budgets = [int(round(base * f ** l)) for l in range(n_levels - 1)]
    budgets.append(max(n_features - sum(budgets), 0))
    return budgets


def pack_descriptors(bits: jnp.ndarray) -> jnp.ndarray:
    """[N,256] {0,1} uint8 -> [N,8] uint32 packed (little-endian bit order)."""
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1)


def unpack_descriptors(packed: jnp.ndarray) -> jnp.ndarray:
    """[N,8] uint32 -> [N,256] {0,1} uint8."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(packed.shape[0], 256).astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("n_features", "n_levels", "scale", "ini_th",
                              "min_th", "cell", "return_stack")
)
def extract_orb_batch(
    imgs: jnp.ndarray,
    n_features: int = 1200,
    n_levels: int = 8,
    scale: float = 1.2,
    ini_th: float = 20.0,
    min_th: float = 7.0,
    cell: int = 32,
    return_stack: bool = False,
):
    """ORB extraction for a batch of images [B,H,W] float32 (0..255).

    All levels and views are processed as ONE padded stack [B*NL, H, W]:
    on TPU the per-level formulation was latency-bound on ~160 small
    sequential kernels (~11 ms/view measured); the stacked form runs the
    same math in ~15 large ops at ~2x the pixel count (upper levels are
    zero-padded to level-0 size) — a large net win.

    Returns Features with leading batch dim [B, N, ...]; with
    return_stack=True also returns the padded level stack [B, NL, H, W]
    (shared by the stereo matcher so XLA computes the pyramid once).
    """
    B, H, W = imgs.shape
    NL = n_levels
    shapes = pyr_ops.level_shapes(H, W, NL, scale)
    budgets = level_budgets(n_features, NL, scale)
    K0 = max(budgets)

    # ---- pyramid: sequential resize chain (batched over views) ----------
    # antialiased bilinear as two banded matmuls per level (MXU): same
    # weights as jax.image.resize(linear, antialias=True) — the prefilter
    # measurably improves upper-level feature stability vs the reference's
    # plain cv::resize(INTER_LINEAR) (trajectory-length error 12% → <10%)
    levels = [imgs]
    for l in range(1, NL):
        levels.append(
            pyr_ops.resize_matmul(levels[-1], shapes[l][0], shapes[l][1])
        )
    # pad width to a lane multiple so pallas patch DMAs need no extra copy
    # (and height to a sublane multiple)
    Hp = ((H + 7) // 8) * 8
    Wp = ((W + 127) // 128) * 128
    stack = jnp.stack(
        [
            jnp.pad(lv, ((0, 0), (0, Hp - s[0]), (0, Wp - s[1])))
            for lv, s in zip(levels, shapes)
        ],
        axis=1,
    )  # [B,NL,Hp,Wp]
    flat = stack.reshape(B * NL, Hp, Wp)

    # ---- per-level interior masks (static shapes via numpy constants) ---
    hs = np.array([s[0] for s in shapes], np.int32)
    ws = np.array([s[1] for s in shapes], np.int32)
    yy = jax.lax.broadcasted_iota(jnp.int32, (NL, Hp, Wp), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (NL, Hp, Wp), 2)
    hs_j = jnp.asarray(hs)[:, None, None]
    ws_j = jnp.asarray(ws)[:, None, None]
    inbB = (
        (yy >= BORDER) & (yy < hs_j - BORDER)
        & (xx >= BORDER) & (xx < ws_j - BORDER)
    )
    tile = lambda m: jnp.broadcast_to(m[None], (B, NL, Hp, Wp)).reshape(
        B * NL, Hp, Wp
    )

    # ---- FAST + NMS + high/low fallback, whole stack at once ------------
    score, raw_lo = pallas_fast.fast_nms_stack(
        flat, hs, ws, NL, ini_th, min_th, cell
    )
    score = jnp.where(tile(inbB), score, 0.0)

    # ---- spatially-uniform selection (vmapped; K0 slots per level) ------
    xyf, respf, validf = jax.vmap(
        lambda s: sel_ops.select_keypoints(s, K0, cell=cell, border=0)
    )(score)

    # static compaction: level l keeps its first `budgets[l]` slots
    sel_idx = np.concatenate(
        [l * K0 + np.arange(b) for l, b in enumerate(budgets)]
    )
    lvl_static = np.concatenate(
        [np.full(b, l, np.int32) for l, b in enumerate(budgets)]
    )
    sigma_static = (scale ** lvl_static).astype(np.float32)
    N = sel_idx.size
    xy = xyf.reshape(B, NL * K0, 2)[:, sel_idx]      # [B,N,2] level-local int
    resp = respf.reshape(B, NL * K0)[:, sel_idx]
    valid = validf.reshape(B, NL * K0)[:, sel_idx]

    # ---- one [48,45] patch DMA per keypoint, then dense algebra ---------
    lvl_b = jnp.broadcast_to(jnp.asarray(lvl_static)[None], (B, N))
    flat_idx = (
        jnp.broadcast_to(jnp.arange(B)[:, None], (B, N)) * NL + lvl_b
    ).reshape(B * N)
    xk = xy[..., 0].reshape(B * N)
    yk = xy[..., 1].reshape(B * N)
    row0 = flat_idx * Hp + yk  # keypoint row in the [B*NL*Hp, Wp] flat image

    flat2d = flat.reshape(B * NL * Hp, Wp)
    patches = pg.gather_patches(
        flat2d, row0 - _PC, xk - _PC, _PH, _PW
    )                                                  # [K, 48, 45]

    # orientation: IC centroid as one moment matmul
    mom = patches.reshape(B * N, _PH * _PW) @ jnp.asarray(_W_MOM)  # [K,2]
    ang = jnp.arctan2(mom[:, 1], mom[:, 0])            # [K]

    # 7x7 Gaussian blur as two band matmuls -> [K,39,39] blurred interior
    blurred = jnp.einsum("kiw,iu->kuw", patches, jnp.asarray(_BR))
    blurred = jnp.einsum(
        "kuw,wv->kuv", blurred, jnp.asarray(_BC)
    ).reshape(B * N, _BLUR_T * _BLUR_T)

    # rBRIEF via per-keypoint selection matmuls (MXU, no gathers). The
    # sample at table position lin = row·39+col factors into two one-hot
    # contractions over the [39,39] blurred patch — each keypoint computes
    # ONLY its own bin's 512 samples (the earlier all-bins formulation
    # computed _N_BINS×512 samples per keypoint and discarded 95/96 of
    # them; ~2 ms → ~0.5 ms). Sampled values are identical: one-hot dots
    # select the same bf16 blurred pixels.
    bins = jnp.mod(
        jnp.round(ang * (_N_BINS / (2.0 * jnp.pi))).astype(jnp.int32), _N_BINS
    )
    rows_k = jnp.asarray(_BIN_LIN // _BLUR_T)[bins]      # [K,512]
    cols_k = jnp.asarray(_BIN_LIN % _BLUR_T)[bins]       # [K,512]
    Rh = jax.nn.one_hot(rows_k, _BLUR_T, dtype=jnp.bfloat16)  # [K,512,39]
    Ch = jax.nn.one_hot(cols_k, _BLUR_T, dtype=jnp.bfloat16)
    blur2d = blurred.reshape(B * N, _BLUR_T, _BLUR_T).astype(jnp.bfloat16)
    tmp = jax.lax.dot_general(
        Rh, blur2d, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                    # [K,512,39]
    vals = jnp.sum(tmp * Ch.astype(jnp.float32), axis=-1)
    vals = vals.reshape(B * N, 256, 2)
    desc = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)  # [K,256]

    # subpixel: separable parabola on the raw low-threshold response
    # (5 scalars per keypoint — small enough for a plain gather)
    raw2d = raw_lo.reshape(B * NL * Hp, Wp)
    sc = raw2d[row0, xk]
    sl = raw2d[row0, xk - 1]
    sr = raw2d[row0, xk + 1]
    su = raw2d[row0 - 1, xk]
    sd = raw2d[row0 + 1, xk]

    def para(m, p, c):
        denom = m + p - 2.0 * c
        off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (m - p) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    sub = jnp.stack([para(sl, sr, sc), para(su, sd, sc)], axis=-1)  # (dx,dy)

    sig = jnp.asarray(sigma_static)
    feats = Features(
        xy=(xy.astype(jnp.float32) + sub.reshape(B, N, 2)) * sig[None, :, None],
        response=resp,
        angle=ang.reshape(B, N),
        level=jnp.broadcast_to(jnp.asarray(lvl_static)[None], (B, N)),
        desc=jnp.where(
            valid.reshape(B, N, 1), desc.reshape(B, N, 256), 0
        ),
        valid=valid,
    )
    if return_stack:
        # patches [B*N,48,45] are keypoint-centred unblurred windows —
        # the stereo SAD refine crops its 11x11 left windows from them
        return feats, stack, patches
    return feats


@functools.partial(
    jax.jit, static_argnames=("n_features", "n_levels", "scale", "ini_th",
                              "min_th", "cell")
)
def extract_orb(
    img: jnp.ndarray,
    n_features: int = 1200,
    n_levels: int = 8,
    scale: float = 1.2,
    ini_th: float = 20.0,
    min_th: float = 7.0,
    cell: int = 32,
) -> Features:
    """Full ORB extraction for one grayscale image [H,W] float32 (0..255).

    Returns a fixed-capacity Features with N = sum of level budgets
    (~n_features). One jit; recompiles only on new image shape/config.
    """
    feats = extract_orb_batch.__wrapped__(
        img[None], n_features=n_features, n_levels=n_levels, scale=scale,
        ini_th=ini_th, min_th=min_th, cell=cell,
    )
    return jax.tree.map(lambda a: a[0], feats)
