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
from orb_slam3_detailed_comments_kor_tpu.ops import pyramid as pyr_ops
from orb_slam3_detailed_comments_kor_tpu.ops import select as sel_ops

_PATTERN = np.load(os.path.join(os.path.dirname(__file__), "orb_pattern.npy"))
HALF_PATCH = 15  # orientation patch radius (reference ORBextractor.cc:71)
BORDER = 19      # EDGE_THRESHOLD (reference ORBextractor.cc:72)


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


def _subpixel_refine(raw_score: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Quadratic subpixel localization on the raw (pre-NMS) FAST response.

    The reference (OpenCV FAST) keeps integer keypoints; the ±0.5 px/level
    quantization is a dominant systematic error for BA on TPU f32, so we
    refine each corner with a separable 3-point parabola. xy [K,2] int32 →
    [K,2] float32 offsets in (-0.5, 0.5).
    """
    h, w = raw_score.shape
    x = jnp.clip(xy[:, 0], 1, w - 2)
    y = jnp.clip(xy[:, 1], 1, h - 2)
    c = raw_score[y, x]
    l = raw_score[y, x - 1]
    r = raw_score[y, x + 1]
    u = raw_score[y - 1, x]
    d = raw_score[y + 1, x]

    def para(m, p, c):
        denom = m + p - 2.0 * c
        off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (m - p) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    return jnp.stack([para(l, r, c), para(u, d, c)], axis=-1)


def _orientation(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per keypoint (IC_Angle analog).

    Computed as two 31x31 cross-correlations (dx·circ and dy·circ kernels)
    over the whole level — the moment maps ride the MXU and each keypoint
    then needs only a 2-value gather, instead of a 961-px patch gather per
    keypoint (the original formulation was gather-bound on TPU).
    """
    r = HALF_PATCH
    dy, dx = jnp.mgrid[-r:r + 1, -r:r + 1]
    circ = (dx * dx + dy * dy) <= r * r  # circular mask, ~umax LUT
    # NOTE (measured on v5e): vmapped dynamic_slice is the fastest patch
    # access here — a 1-channel 31x31 conv lowered ~10x slower, and a 2D
    # advanced-index gather ~2x slower.

    def one(p):
        patch = jax.lax.dynamic_slice(
            img, (p[1] - r, p[0] - r), (2 * r + 1, 2 * r + 1)
        )
        wpatch = jnp.where(circ, patch, 0.0)
        m10 = jnp.sum(wpatch * dx)
        m01 = jnp.sum(wpatch * dy)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(xy)


def _descriptors(
    img_blur: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Rotated BRIEF-256. img_blur [H,W]; xy [K,2] int; angle [K] rad.

    Returns [K,256] uint8 bits. Mirrors computeOrbDescriptor
    (``ORBextractor.cc:106``): sample offsets are the pattern rotated by the
    keypoint angle, rounded to integer pixels; bit i = I(p_2i) < I(p_2i+1).
    """
    pat = jnp.asarray(_PATTERN, dtype=jnp.float32)  # [256,4] x1 y1 x2 y2
    px = jnp.stack([pat[:, 0], pat[:, 2]], axis=-1)  # [256,2]
    py = jnp.stack([pat[:, 1], pat[:, 3]], axis=-1)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # [K]
    # rotated integer offsets, [K,256,2]
    col = jnp.round(px[None] * ca[:, None, None] - py[None] * sa[:, None, None])
    row = jnp.round(px[None] * sa[:, None, None] + py[None] * ca[:, None, None])
    ys = (xy[:, 1, None, None] + row).astype(jnp.int32)
    xs = (xy[:, 0, None, None] + col).astype(jnp.int32)
    h, w = img_blur.shape
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    vals = img_blur[ys, xs]  # [K,256,2] gather
    return (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)


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
    levels = pyr_ops.build_pyramid(img, n_levels, scale)
    budgets = level_budgets(n_features, n_levels, scale)
    outs = []
    for l, (lvl_img, budget) in enumerate(zip(levels, budgets)):
        score = fast_ops.fast_with_fallback(lvl_img, ini_th, min_th, cell=cell)
        xy, resp, valid = sel_ops.select_keypoints(
            score, budget, cell=cell, border=BORDER
        )
        # subpixel localization on the raw low-threshold response surface
        raw = fast_ops.fast_score(lvl_img, min_th)
        sub = _subpixel_refine(raw, xy)
        ang = _orientation(lvl_img, xy)
        blurred = pyr_ops.gaussian_blur(lvl_img, 7, 2.0)
        desc = _descriptors(blurred, xy, ang)
        lvl_scale = scale ** l
        outs.append(
            Features(
                xy=(xy.astype(jnp.float32) + sub) * lvl_scale,
                response=resp,
                angle=ang,
                level=jnp.full((budget,), l, jnp.int32),
                desc=jnp.where(valid[:, None], desc, 0),
                valid=valid,
            )
        )
    return Features(
        xy=jnp.concatenate([o.xy for o in outs]),
        response=jnp.concatenate([o.response for o in outs]),
        angle=jnp.concatenate([o.angle for o in outs]),
        level=jnp.concatenate([o.level for o in outs]),
        desc=jnp.concatenate([o.desc for o in outs]),
        valid=jnp.concatenate([o.valid for o in outs]),
    )
