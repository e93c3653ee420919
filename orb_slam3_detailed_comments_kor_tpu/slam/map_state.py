"""Device-resident SoA map state: keyframes, landmarks, observation graph.

This replaces the reference's pointer-graph map model — ``Map``/``KeyFrame``/
``MapPoint`` objects behind ~15 mutexes (``include/Map.h:42-161``,
``KeyFrame.h:51-385``, ``MapPoint.h:41-183``) — with fixed-capacity arrays
and validity masks that live on the TPU:

- keyframe block: poses (R_cw,t_cw), per-slot feature tables (xy, level,
  packed descriptors, stereo u_right/depth), timestamps;
- landmark block: world positions, representative descriptor, viewing
  normal + scale-band distances (``MapPoint.h:174-176``), found/visible
  counters (``MapPoint.h:166-168``);
- the observation graph is ``obs_lm [K, N]`` — landmark index per feature
  slot (−1 = none), the exact dual of ``Frame::mvpMapPoints``.  Covisibility
  weights (``KeyFrame.cc:406``) are *derived* from it with a one-hot matmul
  instead of being maintained incrementally under locks.

Everything is pure-functional: ops take and return a MapState; "concurrent
edits" of the reference become sequenced functional updates, and the
map-change epoch (``Map.h:84-87``) is simply a new value.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.ops import orb as orb_ops


class MapState(NamedTuple):
    # --- keyframes (capacity K, feature slots N) ---
    kf_R_cw: jnp.ndarray      # [K,3,3]
    kf_t_cw: jnp.ndarray      # [K,3]
    kf_valid: jnp.ndarray     # [K] bool
    kf_time: jnp.ndarray      # [K] float64-ish (float32 seconds)
    kf_xy: jnp.ndarray        # [K,N,2] float32 feature pixels (level-0)
    kf_level: jnp.ndarray     # [K,N] int32
    kf_angle: jnp.ndarray     # [K,N] float32
    kf_desc: jnp.ndarray      # [K,N,8] uint32 packed descriptors
    kf_ur: jnp.ndarray        # [K,N] float32 right-u (-1 mono)
    kf_uvr: jnp.ndarray       # [K,N,2] float32 rig right-cam pixel (x<0 none)
    kf_feat_valid: jnp.ndarray  # [K,N] bool
    # --- observation graph ---
    obs_lm: jnp.ndarray       # [K,N] int32 landmark idx or -1
    # --- landmarks (capacity L) ---
    lm_pos: jnp.ndarray       # [L,3] world
    lm_valid: jnp.ndarray     # [L] bool
    lm_desc: jnp.ndarray      # [L,8] uint32 representative descriptor
    lm_normal: jnp.ndarray    # [L,3] mean viewing direction
    lm_min_dist: jnp.ndarray  # [L] scale-invariance band
    lm_max_dist: jnp.ndarray  # [L]
    lm_found: jnp.ndarray     # [L] int32
    lm_visible: jnp.ndarray   # [L] int32
    lm_first_kf: jnp.ndarray  # [L] int32

    @property
    def K(self) -> int:
        return self.kf_valid.shape[0]

    @property
    def N(self) -> int:
        return self.kf_feat_valid.shape[1]

    @property
    def L(self) -> int:
        return self.lm_valid.shape[0]


def empty_map(max_kf: int, n_feat: int, max_lm: int) -> MapState:
    K, N, L = max_kf, n_feat, max_lm
    return MapState(
        kf_R_cw=jnp.tile(jnp.eye(3)[None], (K, 1, 1)),
        kf_t_cw=jnp.zeros((K, 3)),
        kf_valid=jnp.zeros((K,), bool),
        kf_time=jnp.zeros((K,)),
        kf_xy=jnp.zeros((K, N, 2)),
        kf_level=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N)),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_ur=-jnp.ones((K, N)),
        kf_uvr=-jnp.ones((K, N, 2)),
        kf_feat_valid=jnp.zeros((K, N), bool),
        obs_lm=-jnp.ones((K, N), jnp.int32),
        lm_pos=jnp.zeros((L, 3)),
        lm_valid=jnp.zeros((L,), bool),
        lm_desc=jnp.zeros((L, 8), jnp.uint32),
        lm_normal=jnp.zeros((L, 3)),
        lm_min_dist=jnp.zeros((L,)),
        lm_max_dist=jnp.zeros((L,)),
        lm_found=jnp.zeros((L,), jnp.int32),
        lm_visible=jnp.zeros((L,), jnp.int32),
        lm_first_kf=jnp.zeros((L,), jnp.int32),
    )


def allocate_slots(free: jnp.ndarray, want: jnp.ndarray) -> jnp.ndarray:
    """Assign free slot indices to requests.

    free [L] bool (slot availability), want [M] bool (requests).
    Returns [M] int32: a distinct free slot per wanted request, or -1 if the
    pool ran out / not wanted.  Pure device op (no host compaction).
    """
    L = free.shape[0]
    # rank of each free slot among free slots (0-based), big for taken
    free_rank = jnp.where(free, jnp.cumsum(free) - 1, L + 1)
    # index of the r-th free slot: scatter slot id by rank
    slot_of_rank = jnp.full((L + 2,), -1, jnp.int32).at[free_rank].set(
        jnp.arange(L, dtype=jnp.int32)
    )
    want_rank = jnp.where(want, jnp.cumsum(want) - 1, L + 1)
    want_rank = jnp.minimum(want_rank, L + 1)
    got = slot_of_rank[want_rank]
    return jnp.where(want, got, -1)


def covisibility_weights(ms: MapState, kf_set: jnp.ndarray) -> jnp.ndarray:
    """Shared-landmark counts between keyframes (KeyFrame::UpdateConnections
    analog, derived not maintained).

    kf_set [W] int32 keyframe indices → [W, K] int32 counts of landmarks
    shared with every keyframe in the map.
    """
    L = ms.L
    # indicator [W, L]: does kf_set[i] observe landmark l?
    obs = ms.obs_lm[kf_set]  # [W,N]
    obs_ok = (obs >= 0) & ms.kf_feat_valid[kf_set]
    ind_w = jnp.zeros((kf_set.shape[0], L)).at[
        jnp.arange(kf_set.shape[0])[:, None], jnp.clip(obs, 0)
    ].max(obs_ok.astype(jnp.float32))
    obs_all = ms.obs_lm  # [K,N]
    all_ok = (obs_all >= 0) & ms.kf_feat_valid
    ind_all = jnp.zeros((ms.K, L)).at[
        jnp.arange(ms.K)[:, None], jnp.clip(obs_all, 0)
    ].max(all_ok.astype(jnp.float32))
    counts = jax.lax.dot_general(
        ind_w, ind_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    counts = counts * ms.kf_valid[None, :]
    return counts.astype(jnp.int32)


def landmark_scale_band(
    dist: jnp.ndarray, level: jnp.ndarray, scale: float = 1.2, n_levels: int = 8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale-invariance distance band from the observing level
    (MapPoint::UpdateNormalAndDepth, ``MapPoint.cc:446``)."""
    level_factor = scale ** level.astype(jnp.float32)
    max_dist = dist * level_factor
    min_dist = max_dist / (scale ** (n_levels - 1))
    return min_dist, max_dist


def predict_level(
    dist: jnp.ndarray, max_dist: jnp.ndarray, scale: float = 1.2,
    n_levels: int = 8,
) -> jnp.ndarray:
    """Predict the pyramid level a landmark should appear at from its
    distance (MapPoint::PredictScale, ``MapPoint.cc:534``)."""
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-6), 1e-6)
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(scale)).astype(jnp.int32)
    return jnp.clip(lvl, 0, n_levels - 1)


@jax.jit
def compact_keyframes(ms: MapState):
    """Slide valid keyframes down into the lowest slots, preserving time
    order, so culled slots become insertable again.

    The system inserts keyframes at monotonically increasing slot indices
    (slot order == temporal order — the temporal chain, trajectory
    references and inertial arrays all rely on it). Culling only marks
    slots invalid; this op reclaims them while keeping the order invariant
    (the reference deletes KeyFrame objects instead, ``KeyFrame::SetBadFlag``,
    ``KeyFrame.cc:600``).

    Returns (ms', new_of_old [K] int32 — new slot per old slot, K for
    culled/invalid — and n_valid scalar).
    """
    K = ms.K
    valid = ms.kf_valid
    new_of_old = jnp.where(valid, jnp.cumsum(valid) - 1, K)
    old_of_new = jnp.zeros((K + 1,), jnp.int32).at[new_of_old].set(
        jnp.arange(K, dtype=jnp.int32), mode="drop"
    )
    src = old_of_new[:K]
    n_valid = jnp.sum(valid)
    mask = jnp.arange(K) < n_valid
    take = lambda a: jnp.where(
        mask.reshape((K,) + (1,) * (a.ndim - 1)), a[src],
        jnp.zeros_like(a)
    )
    # remap landmark birth keyframes (used only to group "new" landmarks
    # for fusion); culled parents collapse to slot 0
    first_new = new_of_old[jnp.clip(ms.lm_first_kf, 0, K - 1)]
    return ms._replace(
        kf_R_cw=jnp.where(mask[:, None, None], ms.kf_R_cw[src],
                          jnp.eye(3)[None]),
        kf_t_cw=take(ms.kf_t_cw),
        kf_valid=mask,
        kf_time=take(ms.kf_time),
        kf_xy=take(ms.kf_xy),
        kf_level=take(ms.kf_level),
        kf_angle=take(ms.kf_angle),
        kf_desc=take(ms.kf_desc),
        kf_ur=jnp.where(mask[:, None], ms.kf_ur[src], -1.0),
        kf_uvr=jnp.where(mask[:, None, None], ms.kf_uvr[src], -1.0),
        kf_feat_valid=take(ms.kf_feat_valid),
        obs_lm=jnp.where(mask[:, None], ms.obs_lm[src], -1),
        lm_first_kf=jnp.clip(first_new, 0, K - 1),
    ), new_of_old, n_valid


@jax.jit
def apply_scale(ms: MapState, s) -> MapState:
    """Re-gauge the whole map by a scalar scale (the scale part of
    ``Map::ApplyScaledRotation``, reference ``Map.cc:289``): used after
    monocular-inertial initialization solves the metric scale. Scaling both
    landmark positions and keyframe translations leaves every reprojection
    unchanged while making distances metric."""
    return ms._replace(
        lm_pos=ms.lm_pos * s,
        kf_t_cw=ms.kf_t_cw * s,
        lm_min_dist=ms.lm_min_dist * s,
        lm_max_dist=ms.lm_max_dist * s,
    )
