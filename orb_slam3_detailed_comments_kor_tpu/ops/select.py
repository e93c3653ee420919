"""Spatially-uniform keypoint selection on static shapes.

TPU-native replacement for the reference's quadtree redistribution
(``ORBextractor::DistributeOctTree``, ``src/ORBextractor.cc:537``): the goal
there is "at most N features, spread over the image, keeping the strongest
per region".  A data-dependent quadtree does not map to XLA, so we use the
equivalent *dense* formulation: per-cell top-2 responses (cells ~cell_size
px) form a candidate pool, then a global top-K by score fills a fixed-size
slot array with a validity mask.  Cells bound the local density exactly like
quadtree leaves do.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def select_keypoints(
    score: jnp.ndarray,
    max_kps: int,
    cell: int,
    border: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """score [H,W] (0 = not a corner) -> (xy [K,2] int32 (x,y), resp [K], valid [K]).

    Keeps the top-2 responses per cell, then the global top-K of that pool.
    Invalid slots have resp=0, valid=False, xy=(0,0).
    """
    h, w = score.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (
        (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)
    )
    score = jnp.where(inb, score, 0.0)

    ch = (h + cell - 1) // cell
    cw = (w + cell - 1) // cell
    ph, pw = ch * cell, cw * cell
    pad = jnp.pad(score, ((0, ph - h), (0, pw - w)))
    cells = pad.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3).reshape(
        ch, cw, cell * cell
    )
    # top-2 per cell
    best1 = jnp.max(cells, axis=-1)
    idx1 = jnp.argmax(cells, axis=-1)
    cells2 = cells.at[
        jnp.arange(ch)[:, None], jnp.arange(cw)[None, :], idx1
    ].set(-jnp.inf)
    best2 = jnp.max(cells2, axis=-1)
    idx2 = jnp.argmax(cells2, axis=-1)

    def cell_to_xy(idx):
        cy = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)
        cx = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1)
        y = cy * cell + idx // cell
        x = cx * cell + idx % cell
        return x, y

    x1, y1 = cell_to_xy(idx1)
    x2, y2 = cell_to_xy(idx2)
    pool_scores = jnp.concatenate([best1.ravel(), best2.ravel()])
    pool_x = jnp.concatenate([x1.ravel(), x2.ravel()])
    pool_y = jnp.concatenate([y1.ravel(), y2.ravel()])

    k = min(max_kps, pool_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(pool_scores, k)
    sel_x = pool_x[top_idx]
    sel_y = pool_y[top_idx]
    valid = top_scores > 0.0
    # pad to max_kps if pool was smaller
    if k < max_kps:
        padn = max_kps - k
        top_scores = jnp.concatenate([top_scores, jnp.zeros((padn,))])
        sel_x = jnp.concatenate([sel_x, jnp.zeros((padn,), jnp.int32)])
        sel_y = jnp.concatenate([sel_y, jnp.zeros((padn,), jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros((padn,), bool)])
    xy = jnp.stack([sel_x, sel_y], axis=-1)
    xy = jnp.where(valid[:, None], xy, 0)
    return xy, jnp.where(valid, top_scores, 0.0), valid
