"""Per-keypoint patch gather as a Pallas TPU kernel.

The front-end needs one small image patch per keypoint (orientation /
rBRIEF / SAD windows — reference ``ORBextractor.cc:106``, ``Frame.cc:797``).
XLA lowers both advanced-index gathers and vmapped dynamic_slice to gather
HLOs that run at ~115M elem/s on this TPU runtime (~20 ms/frame for the
descriptor samples alone, measured) — the dominant front-end cost. This
kernel instead issues one HBM→VMEM DMA per keypoint (a [ph,pw] block copy),
with a batch of in-flight DMAs per grid step.

Falls back to an XLA advanced-index gather off-TPU (CPU test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KB = 16      # keypoints per grid step (and in-flight DMAs)
_SB_H = 56    # aligned superblock rows  (>= ph+7, multiple of 8)
_SB_W = 256   # aligned superblock cols  (>= pw+127, multiple of 128)


def _kernel_factory(ph: int, pw: int):
    """HBM DMA slices must start 8-aligned (sublanes) / 128-aligned (lanes),
    so each keypoint pulls an aligned [_SB_H,_SB_W] superblock and the true
    [ph,pw] patch is extracted in-register with dynamic rolls."""

    def kernel(rows_ref, cols_ref, img_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        R = img_ref.shape[0]
        W = img_ref.shape[1]

        def origin(j):
            k = i * _KB + j
            r0 = rows_ref[k]
            c0 = cols_ref[k]
            ra = pl.multiple_of(jnp.minimum((r0 // 8) * 8, R - _SB_H), 8)
            ca = pl.multiple_of(jnp.minimum((c0 // 128) * 128, W - _SB_W), 128)
            return r0, c0, ra, ca

        def make(j):
            _, _, ra, ca = origin(j)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(ra, _SB_H), pl.ds(ca, _SB_W)],
                scratch.at[j],
                sems.at[j],
            )

        for j in range(_KB):
            make(j).start()
        for j in range(_KB):
            make(j).wait()
        for j in range(_KB):
            r0, c0, ra, ca = origin(j)
            blk = scratch[j]                       # [_SB_H,_SB_W]
            # dynamic rolls must use POSITIVE shifts: negative dynamic
            # shifts mis-rotate the sublane axis on this Mosaic version
            blk = pltpu.roll(blk, (_SB_H - (r0 - ra)) % _SB_H, 0)
            blk = pltpu.roll(blk, (_SB_W - (c0 - ca)) % _SB_W, 1)
            out_ref[j] = blk[:ph, :pw]

    return kernel


@functools.partial(jax.jit, static_argnames=("ph", "pw"))
def _gather_patches_pallas(img2d, rows, cols, ph: int, pw: int):
    assert ph + 7 <= _SB_H and pw + 127 <= _SB_W
    K = rows.shape[0]
    Kpad = ((K + _KB - 1) // _KB) * _KB
    rows = jnp.concatenate([rows, jnp.zeros((Kpad - K,), rows.dtype)])
    cols = jnp.concatenate([cols, jnp.zeros((Kpad - K,), cols.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Kpad // _KB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            # index_map also receives the scalar-prefetch refs
            (_KB, ph, pw), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_KB, _SB_H, _SB_W), jnp.float32),
            pltpu.SemaphoreType.DMA((_KB,)),
        ],
    )
    out = pl.pallas_call(
        _kernel_factory(ph, pw),
        out_shape=jax.ShapeDtypeStruct((Kpad, ph, pw), img2d.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, cols, img2d)
    return out[:K]


def _gather_patches_xla(img2d, rows, cols, ph: int, pw: int):
    dy = jnp.arange(ph)
    dx = jnp.arange(pw)
    return img2d[
        rows[:, None, None] + dy[None, :, None],
        cols[:, None, None] + dx[None, None, :],
    ]


def use_pallas() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def gather_patches(img2d, rows, cols, ph: int, pw: int):
    """img2d [R,W]; rows/cols [K] int32 top-left corners (clamped here to
    [0, R-ph] x [0, W-pw]). Returns [K, ph, pw] patches."""
    rows = jnp.clip(rows, 0, img2d.shape[0] - ph)
    cols = jnp.clip(cols, 0, img2d.shape[1] - pw)
    if use_pallas():
        # superblock origins are clamped to R-_SB_H / W-_SB_W, and Mosaic
        # requires those origins 8-/128-aligned — pad so the clamps land
        # on aligned values (the pad is pure bandwidth, ~0.03 ms)
        R, W = img2d.shape
        Rp = ((R + 7) // 8) * 8
        Wp = ((W + 127) // 128) * 128
        if (Rp, Wp) != (R, W):
            img2d = jnp.pad(img2d, ((0, Rp - R), (0, Wp - W)))
        return _gather_patches_pallas(img2d, rows, cols, ph, pw)
    return _gather_patches_xla(img2d, rows, cols, ph, pw)
