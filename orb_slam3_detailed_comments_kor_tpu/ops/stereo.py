"""Rectified stereo matching: row-banded Hamming + SAD subpixel refine.

TPU-native counterpart of ``Frame::ComputeStereoMatches`` (reference
``src/Frame.cc:797``): for every left ORB feature, find the best right
feature on (nearly) the same pyramid level within a ±2σ row band and a
[0, maxD] disparity range by Hamming distance (one masked MXU matmul — see
``matching.py``), then refine the disparity to subpixel with an 11×11 SAD
search (±5 px slide, parabola interpolation) at the feature's own pyramid
level, and reject outliers against the SAD median.

Depth = bf / disparity; features with disparity outside (0, maxD) get
depth = -1 (monocular), mirroring the reference's mvDepth convention.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.ops.matching import (
    TH_HIGH,
    BIG,
    hamming_matrix,
    masked_best2,
)
from orb_slam3_detailed_comments_kor_tpu.ops.orb import Features

_W = 5      # SAD half-window (reference w=5 → 11x11)
_L = 5      # SAD slide range (reference L=5)


class StereoDepth(NamedTuple):
    u_right: jnp.ndarray  # [N] float32 matched right u at level 0 (-1 if none)
    depth: jnp.ndarray    # [N] float32 (-1 if none)
    valid: jnp.ndarray    # [N] bool


def _stack_pyramid(pyr):
    """Pack all levels into one [sumH, W0] 'atlas' image + row offsets.

    One gather from the atlas replaces per-level passes: each keypoint reads
    its patch at its OWN level, eliminating the 8x redundant work of
    evaluating every keypoint at every level (measured ~20ms/frame on-chip).
    """
    w0 = pyr[0].shape[1]
    rows = []
    offs = [0]
    for img in pyr:
        h, w = img.shape
        rows.append(jnp.pad(img, ((0, 0), (0, w0 - w))))
        offs.append(offs[-1] + h)
    return jnp.concatenate(rows, axis=0), jnp.asarray(offs[:-1], jnp.int32)


def _sad_refine_atlas(
    atlas_l,
    atlas_r: jnp.ndarray,
    row_off: jnp.ndarray,
    level_w: jnp.ndarray,
    level_h: jnp.ndarray,
    level: jnp.ndarray,
    xl: jnp.ndarray,
    yl: jnp.ndarray,
    xr0: jnp.ndarray,
    left_patches=None,
):
    """SAD subpixel for ALL keypoints in one shot.

    level [K]; xl/yl/xr0 [K] in level-local coords. Returns (du [K], sad [K]).
    Left 11x11 windows come from ``left_patches`` (the extractor's
    keypoint-centred [K,48,45] patches) when given — zero extra gathers;
    right strips are one pallas patch-DMA per keypoint (advanced-index
    gathers on this runtime cost ~20x more, measured).
    """
    from orb_slam3_detailed_comments_kor_tpu.ops import pallas_gather as pg
    from orb_slam3_detailed_comments_kor_tpu.ops.orb import _PC

    win = 2 * _W + 1
    K = xl.shape[0]
    w_l = level_w[level]
    h_l = level_h[level]
    yi = jnp.clip(jnp.round(yl).astype(jnp.int32), _W, h_l - _W - 1)
    xi = jnp.clip(jnp.round(xl).astype(jnp.int32), _W, w_l - _W - 1)
    xri = jnp.clip(jnp.round(xr0).astype(jnp.int32), _W + _L, w_l - _W - _L - 1)
    base = row_off[level] + yi  # atlas row of the kp

    if left_patches is not None:
        patch_l = left_patches[:, _PC - _W:_PC + _W + 1, _PC - _W:_PC + _W + 1]
        strip_r = pg.gather_patches(
            atlas_r, base - _W, xri - _W - _L, win, win + 2 * _L
        )
    else:
        dy = jnp.arange(-_W, _W + 1)
        dxl = jnp.arange(-_W, _W + 1)
        dxr = jnp.arange(-_W - _L, _W + _L + 1)
        patch_l = atlas_l[
            base[:, None, None] + dy[None, :, None],
            xi[:, None, None] + dxl[None, None, :],
        ]  # [K,win,win]
        strip_r = atlas_r[
            base[:, None, None] + dy[None, :, None],
            xri[:, None, None] + dxr[None, None, :],
        ]  # [K,win,win+2L]
    patch_l_n = patch_l - patch_l[:, _W, _W][:, None, None]
    # slide the 11x11 window across the strip (static unroll, fused by XLA)
    sad_list = []
    for i in range(2 * _L + 1):
        wnd = strip_r[:, :, i:i + win]
        wnd = wnd - wnd[:, _W, _W][:, None, None]
        sad_list.append(jnp.sum(jnp.abs(wnd - patch_l_n), axis=(1, 2)))
    sads = jnp.stack(sad_list, axis=1)  # [K, 11]
    best = jnp.argmin(sads, axis=1)
    s0 = jnp.take_along_axis(sads, best[:, None], axis=1)[:, 0]
    # Subpixel: one Lucas-Kanade (gradient) step on the best-aligned raw
    # window instead of a parabola on the SAD samples — SAD's piecewise-
    # linear cost pixel-locks the parabola by up to ~0.1 px, and planar
    # scenes (correlated fractional disparities) turn that into a
    # SYSTEMATIC disparity bias that scales whole-trajectory motion.
    # patch_l(c) = f(c+δ) ≈ f(c) + f'(c)·δ  ⇒  δ = Σf'(pl−f)/Σf'².
    onehot = jax.nn.one_hot(best, 2 * _L + 1, dtype=strip_r.dtype)
    wnd_best = jnp.zeros_like(patch_l)
    for i in range(2 * _L + 1):
        wnd_best = wnd_best + onehot[:, i, None, None] * strip_r[:, :, i:i + win]
    gx = 0.5 * (wnd_best[:, :, 2:] - wnd_best[:, :, :-2])  # [K,win,win-2]
    diff = (patch_l - wnd_best)[:, :, 1:-1]
    num = jnp.sum(gx * diff, axis=(1, 2))
    den = jnp.sum(gx * gx, axis=(1, 2))
    delta = jnp.where(den > 1e-6, num / jnp.maximum(den, 1e-6), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    du = (best - _L).astype(jnp.float32) + delta + (
        xri.astype(jnp.float32) - xr0
    )
    return du, s0, xi


def compute_stereo_matches(
    left: Features,
    right: Features,
    pyr_l,
    pyr_r,
    bf: float,
    scale: float = 1.2,
    max_row_slack: float = 2.0,
    level_hw=None,
    left_patches=None,
) -> StereoDepth:
    """Full stereo pipeline over fixed-capacity feature sets.

    pyr_l / pyr_r: the image pyramids — either a per-level list (legacy) or
    the padded level stack [NL,Hp,Wp] produced by ``extract_orb_batch``
    (preferred: the same array the extractor already built, so XLA computes
    the pyramid exactly once per frame). For the stack form, pass the TRUE
    per-level shapes via ``level_hw`` (the stack is padded) and optionally
    the extractor's left-view patches for gather-free SAD windows.
    """
    if isinstance(pyr_l, (list, tuple)):
        n_levels = len(pyr_l)
        lvl_hw = [(p.shape[0], p.shape[1]) for p in pyr_l]
    else:
        from orb_slam3_detailed_comments_kor_tpu.ops import pyramid as _pyr

        n_levels = pyr_l.shape[0]
        lvl_hw = level_hw or _pyr.level_shapes(
            pyr_l.shape[1], pyr_l.shape[2], n_levels, scale
        )
    # --- stage 1: banded Hamming match ----------------------------------
    sigma_l = scale ** left.level.astype(jnp.float32)
    row_gap = jnp.abs(left.xy[:, 1:2] - right.xy[None, :, 1])
    row_ok = row_gap <= (max_row_slack * sigma_l[:, None])
    lvl_ok = jnp.abs(left.level[:, None] - right.level[None, :]) <= 1
    disp = left.xy[:, 0:1] - right.xy[None, :, 0]
    # maxD = bf / minZ with minZ = baseline → maxD = fx ≈ bf / b; use bf/0.3m
    max_disp = bf / 0.3
    disp_ok = (disp > 0.0) & (disp < max_disp)
    mask = row_ok & lvl_ok & disp_ok & left.valid[:, None] & right.valid[None, :]
    dist = hamming_matrix(left.desc, right.desc)
    best_idx, best, _ = masked_best2(dist, mask)
    matched = (best <= TH_HIGH) & left.valid

    xr_match = right.xy[best_idx, 0]  # [N] level-0 right u

    # --- stage 2: SAD subpixel at each feature's own level ---------------
    if isinstance(pyr_l, (list, tuple)):
        atlas_l, row_off = _stack_pyramid(pyr_l)
        atlas_r, _ = _stack_pyramid(pyr_r)
    else:
        nl, hh, ww = pyr_l.shape
        atlas_l = pyr_l.reshape(nl * hh, ww)
        atlas_r = pyr_r.reshape(nl * hh, ww)
        row_off = jnp.arange(nl, dtype=jnp.int32) * hh
    level_h = jnp.asarray([s[0] for s in lvl_hw], jnp.int32)
    level_w = jnp.asarray([s[1] for s in lvl_hw], jnp.int32)
    s_per = sigma_l  # scale ** level
    du_lvl, sad_all, xi_lvl = _sad_refine_atlas(
        atlas_l, atlas_r, row_off, level_w, level_h, left.level,
        left.xy[:, 0] / s_per, left.xy[:, 1] / s_per, xr_match / s_per,
        left_patches=left_patches,
    )
    du_all = du_lvl * s_per

    # The SAD/LK alignment localizes the right-image content matching the
    # left patch at the ROUNDED level coordinate xi — so the disparity is
    # xi·σ − u_right_raw (using the subpixel left u here would add the
    # ±0.5 px rounding residue as per-keypoint noise); u_right is then
    # re-expressed at the subpixel left u so the stereo residual
    # u_r = u − bf/z stays consistent downstream.
    u_right_raw = xr_match + du_all
    disparity = xi_lvl.astype(jnp.float32) * s_per - u_right_raw
    u_right = left.xy[:, 0] - disparity
    ok = matched & (disparity > 0.01) & (disparity < max_disp)

    # --- stage 3: median SAD outlier gate (reference 1.5*1.4*median) -----
    sad_valid = jnp.where(ok, sad_all, jnp.nan)
    med = jnp.nanmedian(sad_valid)
    med = jnp.where(jnp.isnan(med), BIG, med)
    ok = ok & (sad_all <= 1.5 * 1.4 * med)

    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), -1.0)
    return StereoDepth(
        u_right=jnp.where(ok, u_right, -1.0), depth=depth, valid=ok
    )
