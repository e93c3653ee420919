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
    """View of img shifted so result[...,y,x] = img[...,y+dy, x+dx]
    (circularly rolled; callers mask the 3px border)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(-2, -1))


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


def _run9_bits(m: jnp.ndarray) -> jnp.ndarray:
    """m [...] int32 with the 16 circle comparisons bit-packed in bits 0-15.
    True iff some circular run of >=9 consecutive bits is set.

    AND-shift doubling on the doubled 32-bit window (branch-free, no
    16-wide axis materialised — the naive [...,16] stack formulation cost
    ~400MB of HBM traffic per frame on the full level stack)."""
    mm = m | (m << 16)
    r = mm & (mm >> 1)    # runs of 2
    r = r & (r >> 2)      # 4
    r = r & (r >> 4)      # 8
    r = r & (mm >> 8)     # 9
    return (r & 0xFFFF) != 0


def fast_scores_two(img: jnp.ndarray, th_high: float, th_low: float):
    """Dense FAST-9 responses at BOTH thresholds in one pass.

    img [...,H,W] float. Returns (score_hi, score_lo), each [...,H,W],
    0 for non-corners; no border masking (caller masks). The 16
    neighbourhood comparisons are accumulated into int32 bitfields so the
    whole computation is a single fused elementwise DAG over the image.
    """
    bits_bh = jnp.zeros(img.shape, jnp.int32)
    bits_dh = jnp.zeros(img.shape, jnp.int32)
    bits_bl = jnp.zeros(img.shape, jnp.int32)
    bits_dl = jnp.zeros(img.shape, jnp.int32)
    mb_h = jnp.zeros_like(img)
    md_h = jnp.zeros_like(img)
    mb_l = jnp.zeros_like(img)
    md_l = jnp.zeros_like(img)
    for k, (dy, dx) in enumerate(CIRCLE_OFFSETS):
        diff = _shift(img, dy, dx) - img
        bits_bh = bits_bh | ((diff > th_high).astype(jnp.int32) << k)
        bits_dh = bits_dh | ((diff < -th_high).astype(jnp.int32) << k)
        bits_bl = bits_bl | ((diff > th_low).astype(jnp.int32) << k)
        bits_dl = bits_dl | ((diff < -th_low).astype(jnp.int32) << k)
        mb_h = mb_h + jnp.maximum(diff - th_high, 0.0)
        md_h = md_h + jnp.maximum(-diff - th_high, 0.0)
        mb_l = mb_l + jnp.maximum(diff - th_low, 0.0)
        md_l = md_l + jnp.maximum(-diff - th_low, 0.0)
    corner_h = _run9_bits(bits_bh) | _run9_bits(bits_dh)
    corner_l = _run9_bits(bits_bl) | _run9_bits(bits_dl)
    score_h = jnp.where(corner_h, jnp.maximum(mb_h, md_h), 0.0)
    score_l = jnp.where(corner_l, jnp.maximum(mb_l, md_l), 0.0)
    return score_h, score_l


def fast_score_raw(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9 response WITHOUT border masking. img [...,H,W] float ->
    score [...,H,W] float (works on batched stacks; the 3px rolled-garbage
    border must be masked by the caller)."""
    bits_b = jnp.zeros(img.shape, jnp.int32)
    bits_d = jnp.zeros(img.shape, jnp.int32)
    margin_b = jnp.zeros_like(img)
    margin_d = jnp.zeros_like(img)
    for k, (dy, dx) in enumerate(CIRCLE_OFFSETS):
        diff = _shift(img, dy, dx) - img
        bits_b = bits_b | ((diff > threshold).astype(jnp.int32) << k)
        bits_d = bits_d | ((diff < -threshold).astype(jnp.int32) << k)
        margin_b = margin_b + jnp.maximum(diff - threshold, 0.0)
        margin_d = margin_d + jnp.maximum(-diff - threshold, 0.0)
    is_corner = _run9_bits(bits_b) | _run9_bits(bits_d)
    return jnp.where(is_corner, jnp.maximum(margin_b, margin_d), 0.0)


def fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9 corner response. img [H,W] float -> score [H,W] float.

    Score is 0 for non-corners; for corners it is the OpenCV FAST score
    family: max over the two polarities of (sum of margins beyond threshold
    over the circle), which correlates with the max-threshold score while
    staying branch-free.
    """
    score = fast_score_raw(img, threshold)
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


def fast_with_fallback_stack(
    flat: jnp.ndarray,
    th_high: float,
    th_low: float,
    cell: int,
    inb: jnp.ndarray,
):
    """Batched high→low fallback over a level stack.

    flat [B,H,W] (padded level images); inb [B,H,W] bool masks each level's
    true interior (3px FAST border inside the level's own extent).
    Returns (score [B,H,W], raw_lo [B,H,W]) where raw_lo is the pre-NMS
    low-threshold response used for subpixel refinement.
    """
    raw_hi, raw_lo = fast_scores_two(flat, th_high, th_low)
    raw_lo = jnp.where(inb, raw_lo, 0.0)
    s_hi = nms3x3(jnp.where(inb, raw_hi, 0.0))
    s_lo = nms3x3(raw_lo)
    b, h, w = flat.shape
    ch = (h + cell - 1) // cell
    cw = (w + cell - 1) // cell
    pad_hi = jnp.pad(s_hi, ((0, 0), (0, ch * cell - h), (0, cw * cell - w)))
    cells_hi = pad_hi.reshape(b, ch, cell, cw, cell)
    has_hi = cells_hi.max(axis=(2, 4)) > 0  # [B,ch,cw]
    use_hi = jnp.repeat(
        jnp.repeat(has_hi, cell, axis=1), cell, axis=2
    )[:, :h, :w]
    return jnp.where(use_hi, s_hi, s_lo), raw_lo


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
