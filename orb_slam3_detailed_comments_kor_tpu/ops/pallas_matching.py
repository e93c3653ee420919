"""Fused Hamming best-2 matcher as a Pallas TPU kernel.

The jnp path (``ops/matching.py``) computes the full [N,M] Hamming matrix
(one MXU matmul), writes it to HBM, re-reads it for masking, and re-reads
again for best/second-best — three HBM round-trips of an O(N·M) matrix per
match call, several calls per frame. This kernel fuses the pipeline: each
[TN,256]×[256,TM] distance tile lives only in VMEM, the candidate mask is
applied in-register, and only the running (best, second, argbest) per row
— O(N) — ever reaches HBM.

ham(a,b) = |a| + |b| − 2·a·b on {0,1} descriptors (the popcount identity,
replacing the reference's scalar loop ``ORBmatcher.cc:2591``), so the
inner product rides the MXU at full tilt.

Falls back to interpret mode off-TPU (CPU tests), and the public entry
point is numerically identical to ``matching.masked_best2`` over
``matching.hamming_matrix``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9
_TN = 128   # rows (descriptors of A) per grid step
_TM = 128   # columns (descriptors of B) per inner tile


def _kernel(a_ref, b_ref, mask_ref, idx_ref, best_ref, second_ref):
    """Grid dim 0 walks N in TN blocks; the M loop is internal.

    a_ref    [TN, 256]  {0,1} f32 block of A-descriptors
    b_ref    [M, 256]   full B matrix (VMEM-resident; M ≤ ~4096)
    mask_ref [TN, M]    candidate mask as f32 (1=allowed)
    idx_ref  [TN]       out: argmin column
    best_ref [TN]       out: best distance
    second_ref [TN]     out: second-best distance
    """
    m_total = b_ref.shape[0]
    n_tiles = m_total // _TM

    a = a_ref[:]                            # [TN,256]
    na = jnp.sum(a, axis=1, keepdims=True)  # [TN,1]

    def tile(j, carry):
        run_best, run_second, run_idx = carry
        b = b_ref[pl.ds(j * _TM, _TM), :]              # [TM,256]
        nb = jnp.sum(b, axis=1)                        # [TM]
        common = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [TN,TM]
        d = na + nb[None, :] - 2.0 * common
        m = mask_ref[:, pl.ds(j * _TM, _TM)]
        d = jnp.where(m > 0.5, d, _BIG)
        # tile best/second
        tb_idx = jnp.argmin(d, axis=1)
        tb = jnp.min(d, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d2 = jnp.where(cols == tb_idx[:, None], _BIG, d)
        ts = jnp.min(d2, axis=1)
        # merge (running ∪ tile) keeping global best two
        new_best = jnp.minimum(run_best, tb)
        new_idx = jnp.where(
            tb < run_best, tb_idx + j * _TM, run_idx
        ).astype(jnp.int32)
        new_second = jnp.minimum(
            jnp.maximum(run_best, tb), jnp.minimum(run_second, ts)
        )
        return new_best, new_second, new_idx

    init = (
        jnp.full((_TN,), _BIG, jnp.float32),
        jnp.full((_TN,), _BIG, jnp.float32),
        jnp.zeros((_TN,), jnp.int32),
    )
    best, second, idx = jax.lax.fori_loop(0, n_tiles, tile, init)
    # outputs are [grid, TN] full-array blocks and each sequential grid
    # step writes its own row: a rank-1 s32[n_pad] output hands XLA a
    # T(1024) layout that Mosaic's T(128) can't satisfy (the r3 on-chip
    # compile failure), and a (1, TN) row block violates the (8, 128)
    # minimum block tiling
    row = pl.program_id(0)
    idx_ref[row, :] = idx
    best_ref[row, :] = best
    second_ref[row, :] = second


def _pad_to(x, n, axis, value=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_masked_best2(
    bits_a: jnp.ndarray,
    bits_b: jnp.ndarray,
    mask: jnp.ndarray,
    interpret: bool = False,
):
    """Fused equivalent of masked_best2(hamming_matrix(a,b), mask).

    bits_a [N,256] {0,1}; bits_b [M,256] {0,1}; mask [N,M] bool.
    Returns (best_idx [N] int32, best [N] f32, second [N] f32).
    Rows with no allowed column return best = BIG (same as the jnp path).
    """
    N, M = mask.shape
    n_pad = ((N + _TN - 1) // _TN) * _TN
    m_pad = ((M + _TM - 1) // _TM) * _TM
    a = _pad_to(bits_a.astype(jnp.float32), n_pad, 0)
    b = _pad_to(bits_b.astype(jnp.float32), m_pad, 0)
    mk = _pad_to(
        _pad_to(mask.astype(jnp.float32), n_pad, 0), m_pad, 1
    )

    grid = (n_pad // _TN,)
    idx, best, second = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TN, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_pad // _TN, _TN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad // _TN, _TN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad // _TN, _TN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // _TN, _TN), jnp.int32),
            jax.ShapeDtypeStruct((n_pad // _TN, _TN), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // _TN, _TN), jnp.float32),
        ],
        interpret=interpret,
    )(a, b, mk)
    return (
        idx.reshape(-1)[:N],
        best.reshape(-1)[:N],
        second.reshape(-1)[:N],
    )


def use_pallas() -> bool:
    return jax.default_backend() in ("tpu", "axon")
