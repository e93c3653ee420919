"""FAST-9 dual-threshold response + 3x3 NMS as one Pallas TPU stencil.

The XLA formulation in ``fast.py`` (16 rolled diffs → bitfield arc test →
margins → NMS) is correct but materializes many full-stack intermediates:
~8 ms/frame of the front-end budget on the [2·NL, H, W] level stack. This
kernel runs the whole stencil out of VMEM in one pass over row tiles:
each grid step DMAs a [TILE+16, W] row band, computes the 16 circle
comparisons with static row slices + lane rolls, the ≥9-contiguous arc
test on an int32 bitfield, the margin scores, and the 3×3 NMS — one HBM
read and three writes per pixel.

Score semantics vs ``fast.py``: corner gating is evaluated at BOTH
thresholds exactly; the *score value* is the low-threshold margin sum for
both maps (the high map is the same response gated by the stricter arc
test). Within-cell ordering — all selection consumes — is preserved; this
saves a third of the VPU work.

Falls back to the XLA path off-TPU (CPU test suite).

Reference: per-cell cv::FAST with high/low fallback in
``ORBextractor::ComputeKeyPointsOctTree`` (``src/ORBextractor.cc:808-838``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam3_detailed_comments_kor_tpu.ops.fast import (
    CIRCLE_OFFSETS, fast_with_fallback_stack as _xla_fallback_stack,
)

_TILE = 64   # output rows per grid step (multiple of 8)
_HALO = 8    # rows of context above/below (circle 3 + NMS 1, 8-aligned)


def _kernel_factory(NL: int, th_high: float, th_low: float, Wp: int):
    def kernel(hs_ref, ws_ref, img_ref, shi_ref, slo_ref, raw_ref,
               scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        level = jax.lax.rem(b, NL)
        h_l = hs_ref[level]
        w_l = ws_ref[level]

        # ---- DMA the row band (halo included; input is pre-padded) ------
        dma = pltpu.make_async_copy(
            img_ref.at[b, pl.ds(i * _TILE, _TILE + 2 * _HALO), :],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()
        img = scratch[:]  # [TILE+16, Wp]

        S = _TILE + 8     # score rows: output rows ± 4 (abs r0-4 .. r0+TILE+4)
        center = img[_HALO - 4:_HALO - 4 + S, :]

        bits_h = jnp.zeros((S, Wp), jnp.int32)
        bits_d_h = jnp.zeros((S, Wp), jnp.int32)
        bits_l = jnp.zeros((S, Wp), jnp.int32)
        bits_d_l = jnp.zeros((S, Wp), jnp.int32)
        margin_b = jnp.zeros((S, Wp), jnp.float32)
        margin_d = jnp.zeros((S, Wp), jnp.float32)
        for k, (dy, dx) in enumerate(CIRCLE_OFFSETS):
            sh = img[_HALO - 4 + dy:_HALO - 4 + dy + S, :]
            if dx:
                sh = pltpu.roll(sh, (-dx) % Wp, 1)
            diff = sh - center
            bits_h = bits_h | ((diff > th_high).astype(jnp.int32) << k)
            bits_d_h = bits_d_h | ((diff < -th_high).astype(jnp.int32) << k)
            bits_l = bits_l | ((diff > th_low).astype(jnp.int32) << k)
            bits_d_l = bits_d_l | ((diff < -th_low).astype(jnp.int32) << k)
            margin_b = margin_b + jnp.maximum(diff - th_low, 0.0)
            margin_d = margin_d + jnp.maximum(-diff - th_low, 0.0)

        def run9(m):
            mm = m | (m << 16)
            r = mm & (mm >> 1)
            r = r & (r >> 2)
            r = r & (r >> 4)
            r = r & (mm >> 8)
            return (r & 0xFFFF) != 0

        corner_h = run9(bits_h) | run9(bits_d_h)
        corner_l = run9(bits_l) | run9(bits_d_l)
        resp = jnp.maximum(margin_b, margin_d)

        # ---- 3px interior mask of this level's true extent --------------
        yy = jax.lax.broadcasted_iota(jnp.int32, (S, Wp), 0) + i * _TILE - 4
        xx = jax.lax.broadcasted_iota(jnp.int32, (S, Wp), 1)
        inb = (yy >= 3) & (yy < h_l - 3) & (xx >= 3) & (xx < w_l - 3)
        score_h = jnp.where(corner_h & inb, resp, 0.0)
        score_l = jnp.where(corner_l & inb, resp, 0.0)

        # ---- 3x3 NMS over rows [4, TILE+4) ------------------------------
        def nms(s):
            best = jnp.full((_TILE, Wp), -jnp.inf, jnp.float32)
            for dy in (-1, 0, 1):
                rows = s[4 + dy:4 + dy + _TILE, :]
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    n = pltpu.roll(rows, (-dx) % Wp, 1) if dx else rows
                    best = jnp.maximum(best, n)
            c = s[4:4 + _TILE, :]
            return jnp.where((c >= best) & (c > 0), c, 0.0)

        shi_ref[0] = nms(score_h)
        slo_ref[0] = nms(score_l)
        raw_ref[0] = score_l[4:4 + _TILE, :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_levels", "th_high", "th_low")
)
def _fast_nms_pallas(flat, hs, ws, n_levels: int, th_high: float,
                     th_low: float):
    BN, Hp, Wp = flat.shape
    nT = (Hp + _TILE - 1) // _TILE
    Hpad = nT * _TILE
    padded = jnp.pad(
        flat, ((0, 0), (_HALO, Hpad - Hp + _HALO), (0, 0))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BN, nT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((1, _TILE, Wp), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE, Wp), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE, Wp), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_TILE + 2 * _HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    shi, slo, raw = pl.pallas_call(
        _kernel_factory(n_levels, th_high, th_low, Wp),
        out_shape=(
            jax.ShapeDtypeStruct((BN, Hpad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((BN, Hpad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((BN, Hpad, Wp), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(hs, ws, padded)
    return shi[:, :Hp], slo[:, :Hp], raw[:, :Hp]


def use_pallas() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def fast_nms_stack(flat, hs, ws, n_levels: int, th_high: float,
                   th_low: float, cell: int):
    """High/low fallback FAST over a padded level stack.

    flat [B·NL, Hp, Wp] float32; hs/ws [NL] int32 true level extents.
    Returns (score [B·NL,Hp,Wp] — NMS'd, per-cell high→low fallback
    applied — and raw_lo — the pre-NMS low-threshold response for subpixel
    refinement). Matches ``fast.fast_with_fallback_stack`` semantics with
    the score-value caveat in the module docstring.
    """
    BN, Hp, Wp = flat.shape
    if not use_pallas():
        NL = n_levels
        yy = jax.lax.broadcasted_iota(jnp.int32, (NL, Hp, Wp), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (NL, Hp, Wp), 2)
        hs_j = jnp.asarray(hs)[:, None, None]
        ws_j = jnp.asarray(ws)[:, None, None]
        inb3 = (yy >= 3) & (yy < hs_j - 3) & (xx >= 3) & (xx < ws_j - 3)
        B = BN // NL
        inb = jnp.broadcast_to(inb3[None], (B, NL, Hp, Wp)).reshape(
            BN, Hp, Wp
        )
        return _xla_fallback_stack(flat, th_high, th_low, cell, inb)
    shi, slo, raw = _fast_nms_pallas(
        flat, jnp.asarray(hs, jnp.int32), jnp.asarray(ws, jnp.int32),
        n_levels, float(th_high), float(th_low),
    )
    # per-cell high→low fallback (cheap XLA reductions)
    ch = (Hp + cell - 1) // cell
    cw = (Wp + cell - 1) // cell
    pad_hi = jnp.pad(shi, ((0, 0), (0, ch * cell - Hp), (0, cw * cell - Wp)))
    cells_hi = pad_hi.reshape(BN, ch, cell, cw, cell)
    has_hi = cells_hi.max(axis=(2, 4)) > 0
    use_hi = jnp.repeat(
        jnp.repeat(has_hi, cell, axis=1), cell, axis=2
    )[:, :Hp, :Wp]
    return jnp.where(use_hi, shi, slo), raw
