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


def _sad_refine_level(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    xl: jnp.ndarray,
    yl: jnp.ndarray,
    xr0: jnp.ndarray,
) -> tuple:
    """SAD subpixel at one pyramid level.

    xl, yl, xr0: [K] float level-local coords (left kp and right initial u).
    Returns (delta_u [K], best_sad [K]): refined right-u offset and score.
    """
    h, w = img_l.shape
    K = xl.shape[0]
    win = 2 * _W + 1

    def one(xl_i, yl_i, xr_i):
        yi = jnp.clip(jnp.round(yl_i).astype(jnp.int32), _W, h - _W - 1)
        xi = jnp.clip(jnp.round(xl_i).astype(jnp.int32), _W, w - _W - 1)
        xri = jnp.clip(
            jnp.round(xr_i).astype(jnp.int32), _W + _L, w - _W - _L - 1
        )
        patch_l = jax.lax.dynamic_slice(
            img_l, (yi - _W, xi - _W), (win, win)
        )
        # normalize by center intensity (reference subtracts center value)
        patch_l = patch_l - patch_l[_W, _W]
        strip_r = jax.lax.dynamic_slice(
            img_r, (yi - _W, xri - _W - _L), (win, win + 2 * _L)
        )

        def sad_at(inc):
            pr = jax.lax.dynamic_slice(strip_r, (0, inc), (win, win))
            pr = pr - pr[_W, _W]
            return jnp.sum(jnp.abs(patch_l - pr))

        sads = jax.vmap(sad_at)(jnp.arange(2 * _L + 1))
        best = jnp.argmin(sads)
        s_m = sads[jnp.clip(best - 1, 0, 2 * _L)]
        s_0 = sads[best]
        s_p = sads[jnp.clip(best + 1, 0, 2 * _L)]
        denom = s_m + s_p - 2.0 * s_0
        delta = jnp.where(
            denom > 1e-6, 0.5 * (s_m - s_p) / jnp.maximum(denom, 1e-6), 0.0
        )
        delta = jnp.clip(delta, -1.0, 1.0)
        du = (best - _L).astype(jnp.float32) + delta + (
            xri.astype(jnp.float32) - xr_i
        )
        return du, s_0

    return jax.vmap(one)(xl, yl, xr0)


def compute_stereo_matches(
    left: Features,
    right: Features,
    pyr_l: List[jnp.ndarray],
    pyr_r: List[jnp.ndarray],
    bf: float,
    scale: float = 1.2,
    max_row_slack: float = 2.0,
) -> StereoDepth:
    """Full stereo pipeline over fixed-capacity feature sets.

    pyr_l / pyr_r: the image pyramids (same lists the extractor built —
    call inside the same jit so XLA shares them).
    """
    n_levels = len(pyr_l)
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
    inv_sigma = 1.0 / sigma_l
    du_all = jnp.zeros_like(xr_match)
    sad_all = jnp.full_like(xr_match, BIG)
    for l in range(n_levels):
        s = float(scale) ** l
        du_l, sad_l = _sad_refine_level(
            pyr_l[l],
            pyr_r[l],
            left.xy[:, 0] / s,
            left.xy[:, 1] / s,
            xr_match / s,
        )
        on_level = left.level == l
        du_all = jnp.where(on_level, du_l * s, du_all)
        sad_all = jnp.where(on_level, sad_l, sad_all)

    u_right = xr_match + du_all
    disparity = left.xy[:, 0] - u_right
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
