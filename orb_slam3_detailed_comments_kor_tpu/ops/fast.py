"""FAST-9/16 corner detection as dense vectorized image ops.

TPU-native counterpart of the per-cell cv::FAST calls in
``ORBextractor::ComputeKeyPointsOctTree`` (reference
``src/ORBextractor.cc:808-838``).  Instead of scanning pixel-by-pixel, the
whole image is tested at once: the 16 Bresenham-circle neighbours are
materialised as shifted views (16 rolls — pure VPU work, fused by XLA), the
"≥9 contiguous brighter/darker" arc test is a bitwise trick on a 16-bit
mask, and the score is the OpenCV-style sum-of-absolute-margins over the
qualifying arc.  Non-max suppression is a 3x3 max-pool comparison.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3: 16 (dy, dx) offsets, clockwise from 12
# o'clock (same circle OpenCV uses; a geometric constant, not code).
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

_ARC_LEN = 9  # FAST-9: need >= 9 contiguous


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """View of img shifted so result[y,x] = img[y+dy, x+dx] (zero-padded)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


def _has_contiguous_run(mask16: jnp.ndarray) -> jnp.ndarray:
    """mask16: [...,16] bool -> bool, True iff a circular run of >=9 ones.

    Implemented as iterated AND of rotations: run_k[i] = all of
    mask[i..i+k-1] (circular). After log-steps doubling we get run_9.
    """
    # r1 = mask; r2[i] = m[i] & m[i+1]; r4[i] = r2[i] & r2[i+2]; r8 = ...;
    # r9[i] = r8[i] & r1[i+8]
    r = mask16
    r = r & jnp.roll(r, -1, axis=-1)   # runs of 2
    r = r & jnp.roll(r, -2, axis=-1)   # 4
    r = r & jnp.roll(r, -4, axis=-1)   # 8
    r = r & jnp.roll(mask16, -8, axis=-1)  # 9
    return jnp.any(r, axis=-1)


def fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9 corner response. img [H,W] float -> score [H,W] float.

    Score is 0 for non-corners; for corners it is the OpenCV FAST score
    family: max over the two polarities of (sum of margins beyond threshold
    over the circle), which correlates with the max-threshold score while
    staying branch-free.
    """
    center = img
    neigh = jnp.stack(
        [_shift(img, dy, dx) for (dy, dx) in CIRCLE_OFFSETS], axis=-1
    )  # [H,W,16]
    diff = neigh - center[..., None]
    brighter = diff > threshold
    darker = diff < -threshold
    is_corner = _has_contiguous_run(brighter) | _has_contiguous_run(darker)
    margin_b = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=-1)
    margin_d = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=-1)
    score = jnp.maximum(margin_b, margin_d)
    score = jnp.where(is_corner, score, 0.0)
    # kill the 3px border (rolled garbage)
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(inb, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only local maxima over a 3x3 window (strictly greater than any
    neighbour that precedes it in raster order; ties broken toward first)."""
    neighbors = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neighbors.append(_shift(score, dy, dx))
    nmax = jnp.stack(neighbors, axis=-1).max(axis=-1)
    return jnp.where(score >= nmax, score, 0.0) * (score > 0)


def fast_with_fallback(
    img: jnp.ndarray, th_high: float, th_low: float, cell: int
) -> jnp.ndarray:
    """Reference semantics (ORBextractor.cc:808-838): try FAST with the high
    threshold per cell; cells with no response retry with the low threshold.

    Dense formulation: compute both score maps; for each cell, use the
    high-threshold map if it has any corner there, else the low one.
    """
    s_hi = nms3x3(fast_score(img, th_high))
    s_lo = nms3x3(fast_score(img, th_low))
    h, w = img.shape
    ch = (h + cell - 1) // cell
    cw = (w + cell - 1) // cell
    ph, pw = ch * cell, cw * cell
    pad_hi = jnp.pad(s_hi, ((0, ph - h), (0, pw - w)))
    cells_hi = pad_hi.reshape(ch, cell, cw, cell)
    has_hi = cells_hi.max(axis=(1, 3)) > 0  # [ch,cw]
    use_hi = jnp.repeat(jnp.repeat(has_hi, cell, axis=0), cell, axis=1)[:h, :w]
    return jnp.where(use_hi, s_hi, s_lo)
