"""Atlas map merging: re-join a shelved map when place recognition finds
overlap with the active map.

Counterpart of ``LoopClosing::MergeLocal`` (visual, ``LoopClosing.cc:1288``)
and ``MergeLocal2`` (inertial, ``:1837``): when tracking was lost hard, the
Atlas shelved the old map and started fresh (``Tracking::CreateMapInAtlas``,
``Tracking.cc:2609``); once the camera revisits mapped territory the two
maps are welded — the ACTIVE (younger) map is rigidly transformed into the
shelved map's frame, keyframe/landmark blocks are concatenated, duplicate
landmarks are fused, and a pose-graph + weld-window BA distributes the
seam error.

TPU-native design: both maps are fixed-capacity SoA blocks, so the merge is
array surgery — scatter the source block into the target's free slots with
an index remap — followed by the same batched pose-graph/BA kernels loop
closing uses. No welding-window pointer bookkeeping.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.models import vocabulary as voc
from orb_slam3_detailed_comments_kor_tpu.ops import matching, orb as orb_ops, ransac
from orb_slam3_detailed_comments_kor_tpu.optim import pose_graph
from orb_slam3_detailed_comments_kor_tpu.slam import map_state as msx
from orb_slam3_detailed_comments_kor_tpu.utils import lie


def detect_merge_candidate(
    bow_cur,
    shelved_db,
    n_kf_shelved: int,
    min_score: float = 0.20,
) -> Tuple[int, float]:
    """Score the current keyframe's sparse BoW row against a shelved
    map's database (KeyFrameDatabase::DetectNBestCandidates merge path).

    bow_cur: (ids [T], wts [T]); shelved_db: (ids [K,T], wts [K,T]).
    Returns (best_kf_idx_or_-1, score).
    """
    q_ids, q_wts = bow_cur
    db_ids, db_wts = shelved_db
    scores = np.array(voc.sparse_l1_score(
        q_ids, q_wts, db_ids[:n_kf_shelved], db_wts[:n_kf_shelved]
    ))
    cand = int(scores.argmax())
    if scores[cand] < min_score:
        return -1, float(scores[cand])
    return cand, float(scores[cand])


def verify_merge(
    ms_cur: msx.MapState,
    kf_cur: int,
    ms_old: msx.MapState,
    kf_old: int,
    key,
    min_inliers: int = 20,
    cam_params=None,
    bf: float = 0.0,
    w: int = 0,
    h: int = 0,
    scale: float = 1.2,
    n_levels: int = 8,
):
    """Geometric verification across maps, at REPROJECTION accuracy.

    3-D↔3-D Horn alignment of matched landmarks (the obvious choice) is
    too blunt for the weld: triangulated landmark noise at short baselines
    is ~dm, so the fitted transform inherits a comparable bias. Instead —
    mirroring the reference's reprojection-refined Sim3 pipeline
    (``Sim3Solver`` RANSAC then ``OptimizeSim3``, ``LoopClosing.cc:767,828``)
    — we *relocalize the current keyframe inside the shelved map*:
    descriptor matches give 2-D(cur)↔3-D(old) pairs, PnP RANSAC gives the
    camera pose in the old world at pixel-level accuracy, and a guided
    track_frame refine against the whole shelved map hardens the gate.

    Returns (ok, R, t) with X_old ≈ R·X_cur + t, derived from
    D = T_cw_old⁻¹ ∘ T_cw_cur of the same physical camera.
    """
    from orb_slam3_detailed_comments_kor_tpu.slam import frontend as fe
    from orb_slam3_detailed_comments_kor_tpu.slam import tracking as trk

    da = orb_ops.unpack_descriptors(ms_cur.kf_desc[kf_cur])
    db = orb_ops.unpack_descriptors(ms_old.kf_desc[kf_old])
    va = ms_cur.kf_feat_valid[kf_cur]
    vb = ms_old.kf_feat_valid[kf_old] & (ms_old.obs_lm[kf_old] >= 0)
    res = matching.match_nn_ratio(da, db, va, vb, max_dist=60, ratio=0.85)
    feat_b = jnp.clip(res.idx, 0)
    lm_b = ms_old.obs_lm[kf_old, feat_b]
    pair_ok = res.valid & (lm_b >= 0)
    X_old = ms_old.lm_pos[jnp.clip(lm_b, 0)]
    uv_cur = ms_cur.kf_xy[kf_cur]
    R_pnp, t_pnp, _inl, n_pnp = ransac.pnp_ransac(
        X_old, uv_cur, pair_ok, cam_params, key, n_hyp=192, inlier_px=6.0
    )
    if int(n_pnp) < 12:
        return False, R_pnp, t_pnp
    # guided refinement against the whole shelved map (reloc-style gate)
    frame = fe.Frame(
        xy=uv_cur,
        level=ms_cur.kf_level[kf_cur],
        angle=ms_cur.kf_angle[kf_cur],
        desc=da,
        desc_packed=ms_cur.kf_desc[kf_cur],
        u_right=ms_cur.kf_ur[kf_cur],
        depth=jnp.where(
            ms_cur.kf_ur[kf_cur] >= 0,
            bf / jnp.maximum(
                ms_cur.kf_xy[kf_cur, :, 0] - ms_cur.kf_ur[kf_cur], 1e-3
            ),
            -jnp.ones_like(ms_cur.kf_ur[kf_cur]),
        ),
        valid=va,
    )
    tr = trk.track_frame(
        ms_old, frame, R_pnp, t_pnp, cam_params, bf,
        w=w, h=h, scale=scale, n_levels=n_levels,
    )
    ok = int(tr.n_inliers) >= max(30, min_inliers)
    # D = T_cw_old⁻¹ ∘ T_cw_cur
    Ro_i, to_i = lie.se3_inverse(tr.R_cw, tr.t_cw)
    R_d, t_d = lie.se3_compose(
        Ro_i, to_i, ms_cur.kf_R_cw[kf_cur], ms_cur.kf_t_cw[kf_cur]
    )
    return ok, R_d, t_d


@jax.jit
def _concat_maps(
    ms_old: msx.MapState,
    ms_cur: msx.MapState,
    n_kf_old: jnp.ndarray,
    R_d: jnp.ndarray,
    t_d: jnp.ndarray,
):
    """Weld the ACTIVE map (cur) into the shelved map's (old) arrays.

    cur poses/landmarks are transformed by the world-to-world delta
    (X_old = R_d·X_cur + t_d; T_cw' = T_cw ∘ D⁻¹), then scattered into
    old's free keyframe/landmark slots. Returns (ms_merged, kf_remap [K],
    n_kf_total, lm_overflow).
    """
    K, N, L = ms_old.K, ms_old.N, ms_old.L
    Rd_i, td_i = lie.se3_inverse(R_d, t_d)

    # --- keyframes: cur kf i → slot n_kf_old + rank(i among valid) -------
    cur_valid = ms_cur.kf_valid
    rank = jnp.cumsum(cur_valid.astype(jnp.int32)) - 1
    kf_dst = jnp.where(cur_valid, n_kf_old + rank, K)  # K = parked
    # transformed poses: T_cw_new = T_cw_cur ∘ D⁻¹
    R_new = jnp.einsum("kij,jl->kil", ms_cur.kf_R_cw, Rd_i)
    t_new = (
        jnp.einsum("kij,j->ki", ms_cur.kf_R_cw, td_i) + ms_cur.kf_t_cw
    )

    # --- landmarks: allocate free slots in old ---------------------------
    slots = msx.allocate_slots(~ms_old.lm_valid, ms_cur.lm_valid)
    got = slots >= 0
    sl = jnp.where(got, slots, L)  # park overflow at L
    lm_overflow = jnp.sum(ms_cur.lm_valid & ~got)
    X_new = ms_cur.lm_pos @ R_d.T + t_d
    nrm_new = ms_cur.lm_normal @ R_d.T

    ms = ms_old._replace(
        lm_pos=ms_old.lm_pos.at[sl].set(X_new, mode="drop"),
        lm_valid=ms_old.lm_valid.at[sl].set(
            ms_cur.lm_valid, mode="drop"
        ),
        lm_desc=ms_old.lm_desc.at[sl].set(ms_cur.lm_desc, mode="drop"),
        lm_normal=ms_old.lm_normal.at[sl].set(nrm_new, mode="drop"),
        lm_min_dist=ms_old.lm_min_dist.at[sl].set(
            ms_cur.lm_min_dist, mode="drop"
        ),
        lm_max_dist=ms_old.lm_max_dist.at[sl].set(
            ms_cur.lm_max_dist, mode="drop"
        ),
        lm_found=ms_old.lm_found.at[sl].set(ms_cur.lm_found, mode="drop"),
        lm_visible=ms_old.lm_visible.at[sl].set(
            ms_cur.lm_visible, mode="drop"
        ),
        lm_first_kf=ms_old.lm_first_kf.at[sl].set(
            jnp.where(
                ms_cur.lm_first_kf >= 0, kf_dst[jnp.clip(
                    ms_cur.lm_first_kf, 0)], -1
            ),
            mode="drop",
        ),
    )

    # --- observation rows: remap landmark ids then scatter ----------------
    lm_remap = jnp.where(got, slots, -1)  # [L] cur lm id → merged id
    obs_new = jnp.where(
        ms_cur.obs_lm >= 0, lm_remap[jnp.clip(ms_cur.obs_lm, 0)], -1
    )
    ms = ms._replace(
        kf_R_cw=ms.kf_R_cw.at[kf_dst].set(R_new, mode="drop"),
        kf_t_cw=ms.kf_t_cw.at[kf_dst].set(t_new, mode="drop"),
        kf_valid=ms.kf_valid.at[kf_dst].set(cur_valid, mode="drop"),
        kf_time=ms.kf_time.at[kf_dst].set(ms_cur.kf_time, mode="drop"),
        kf_xy=ms.kf_xy.at[kf_dst].set(ms_cur.kf_xy, mode="drop"),
        kf_level=ms.kf_level.at[kf_dst].set(ms_cur.kf_level, mode="drop"),
        kf_angle=ms.kf_angle.at[kf_dst].set(ms_cur.kf_angle, mode="drop"),
        kf_desc=ms.kf_desc.at[kf_dst].set(ms_cur.kf_desc, mode="drop"),
        kf_ur=ms.kf_ur.at[kf_dst].set(ms_cur.kf_ur, mode="drop"),
        kf_uvr=ms.kf_uvr.at[kf_dst].set(ms_cur.kf_uvr, mode="drop"),
        kf_feat_valid=ms.kf_feat_valid.at[kf_dst].set(
            ms_cur.kf_feat_valid, mode="drop"
        ),
        obs_lm=ms.obs_lm.at[kf_dst].set(obs_new, mode="drop"),
    )
    n_total = n_kf_old + jnp.sum(cur_valid)
    return ms, kf_dst, n_total, lm_overflow


@jax.jit
def fuse_duplicate_landmarks(
    ms: msx.MapState,
    src_is_new: jnp.ndarray,   # [L] landmarks that came from the welded map
    radius: float = 0.05,
    max_hamming: int = 50,
):
    """SearchAndFuse analog (``LoopClosing.cc:2126``) in 3-D: a welded
    landmark within `radius` of an original landmark with a matching
    descriptor is replaced by it (observations rewritten).

    3-D nearest-neighbour + descriptor gate replaces the reference's
    per-keyframe reprojection fuse — O(L²) brute force rides the MXU.
    """
    L = ms.L
    old_mask = ms.lm_valid & ~src_is_new
    new_mask = ms.lm_valid & src_is_new
    # chunked nearest-old-landmark search: an [L,L] distance matrix is 4 GB
    # at capacity, so scan over 1024-row blocks (each block is a small
    # matmul-shaped reduction the compiler vectorizes well)
    chunk = min(1024, L)
    n_chunks = (L + chunk - 1) // chunk
    pos_pad = jnp.pad(ms.lm_pos, ((0, n_chunks * chunk - L), (0, 0)))
    blocks = pos_pad.reshape(n_chunks, chunk, 3)

    def one_block(blk):
        d2 = jnp.sum((blk[:, None, :] - ms.lm_pos[None, :, :]) ** 2, -1)
        d2 = jnp.where(old_mask[None, :], d2, jnp.inf)
        nb = jnp.argmin(d2, axis=1)
        return nb, jnp.take_along_axis(d2, nb[:, None], 1)[:, 0]

    nearest, near_d2 = jax.lax.map(one_block, blocks)
    nearest = nearest.reshape(-1)[:L]
    near_ok = near_d2.reshape(-1)[:L] < radius ** 2
    ham = jnp.sum(
        jax.lax.population_count(
            jnp.bitwise_xor(ms.lm_desc, ms.lm_desc[nearest])
        ),
        axis=-1,
    ).astype(jnp.int32)
    fuse = new_mask & near_ok & (ham <= max_hamming)
    # rewrite observations: fused new id → old id  (MapPoint::Replace)
    remap = jnp.where(fuse, nearest, jnp.arange(L))
    obs = jnp.where(ms.obs_lm >= 0, remap[jnp.clip(ms.obs_lm, 0)], -1)
    # found/visible counters accumulate onto the kept landmark
    lm_found = ms.lm_found.at[nearest].add(jnp.where(fuse, ms.lm_found, 0))
    lm_visible = ms.lm_visible.at[nearest].add(
        jnp.where(fuse, ms.lm_visible, 0)
    )
    return ms._replace(
        lm_valid=ms.lm_valid & ~fuse,
        obs_lm=obs,
        lm_found=lm_found,
        lm_visible=lm_visible,
    ), jnp.sum(fuse)


def merge_into_shelved(
    slam,
    shelf_idx: int,
    kf_cur: int,
    kf_old: int,
    R_d,
    t_d,
) -> bool:
    """Execute the merge: weld active map into ``slam.atlas_maps[shelf_idx]``
    and make the result the active map (MergeLocal main body).

    Returns False (no mutation) if capacities cannot hold both maps.
    """
    shelf = slam.atlas_maps[shelf_idx]
    ms_old, n_old = shelf["ms"], shelf["n_kf"]
    n_cur = slam.n_kf
    if n_old + n_cur > slam.ms.K:
        return False

    ms, kf_dst, n_total, lm_overflow = _concat_maps(
        ms_old, slam.ms, jnp.int32(n_old), R_d, t_d
    )
    if int(lm_overflow) > 0:
        return False
    n_total = int(n_total)

    # duplicate fusion in the weld region
    src_is_new = jnp.zeros((ms.L,), bool)
    src_slots = msx.allocate_slots(~ms_old.lm_valid, slam.ms.lm_valid)
    src_is_new = src_is_new.at[jnp.clip(src_slots, 0)].set(
        src_slots >= 0, mode="drop"
    )
    ms, _n_fused = fuse_duplicate_landmarks(ms, src_is_new)

    # pose-graph weld: temporal chains of both maps + the merge edge
    kf_cur_new = int(np.asarray(kf_dst)[kf_cur])
    i_seq = jnp.arange(n_total - 1)
    j_seq = jnp.arange(1, n_total)
    # the chain crosses the map boundary at n_old; drop that fake edge
    seq_ok = i_seq != (n_old - 1)
    edges = pose_graph.make_edges_from_poses(
        i_seq, j_seq, ms.kf_R_cw, ms.kf_t_cw
    )
    edges = edges._replace(valid=edges.valid & seq_ok)
    Rj_i, tj_i = lie.se3_inverse(ms.kf_R_cw[kf_old], ms.kf_t_cw[kf_old])
    Rw, tw = lie.se3_compose(
        ms.kf_R_cw[kf_cur_new], ms.kf_t_cw[kf_cur_new], Rj_i, tj_i
    )
    e_weld = pose_graph.PoseGraphEdges(
        i=jnp.array([kf_cur_new], jnp.int32),
        j=jnp.array([kf_old], jnp.int32),
        R_meas=Rw[None], t_meas=tw[None], s_meas=jnp.ones((1,)),
        weight=jnp.array([30.0]), valid=jnp.ones((1,), bool),
    )
    edges = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), edges, e_weld)
    fixed = jnp.zeros((n_total,), bool).at[0].set(True).at[kf_old].set(True)
    R_pg, t_pg = pose_graph.optimize_pose_graph_se3(
        ms.kf_R_cw[:n_total], ms.kf_t_cw[:n_total], edges, fixed, iters=10
    )
    ms = ms._replace(
        kf_R_cw=ms.kf_R_cw.at[:n_total].set(R_pg),
        kf_t_cw=ms.kf_t_cw.at[:n_total].set(t_pg),
    )

    # welding-window BA (MergeBundleAdjustmentVisual, ``Optimizer.cc:5296``):
    # the pose-graph weld aligns the chains rigidly, but the seam region —
    # where the two maps' landmarks were just fused — carries the residual
    # misalignment. A covisibility-window BA centred on the welding keyframe
    # pulls in both sides (fusion made them covisible) and distributes the
    # error; the rest of both maps stays untouched, like the reference's
    # outside-fixed welding optimization.
    from orb_slam3_detailed_comments_kor_tpu.slam import tracking

    ms = tracking.local_ba_step(
        ms, jnp.int32(kf_cur_new), slam.cam_params, slam.cfg.camera.bf,
        window=12, lm_cap=slam.cfg.capacity.max_local_landmarks,
        iters=4, cam_model=slam.cam_model, rig=slam.rig,
    )

    # --- install as the active map ---------------------------------------
    # current camera pose moves with its map: T_cw' = T_cw ∘ D⁻¹
    Rd_i, td_i = lie.se3_inverse(R_d, t_d)
    slam.R_cw, slam.t_cw = lie.se3_compose(slam.R_cw, slam.t_cw, Rd_i, td_i)
    slam.has_velocity = False
    slam.ms = ms
    slam.n_kf = n_total

    # merge the BoW databases: old rows stay, cur rows land at kf_dst
    lc_old = shelf.get("loop_closer")
    if (
        lc_old is not None and lc_old.db_words is not None
        and slam.loop_closer.db_words is not None
    ):
        dbw, dbv = lc_old.db_words, lc_old.db_wts
        dst = np.asarray(kf_dst)
        cw, cv = slam.loop_closer.db_words, slam.loop_closer.db_wts
        for i in range(n_cur):
            if dst[i] < ms.K:
                dbw = dbw.at[int(dst[i])].set(cw[i])
                dbv = dbv.at[int(dst[i])].set(cv[i])
        lc_old.db_words, lc_old.db_wts = dbw, dbv
        slam.loop_closer = lc_old

    # --- inertial state weld (MergeLocal2, ``LoopClosing.cc:1837``) -------
    # old map is the base: its gravity frame wins; current-map velocities
    # are world vectors and rotate with the map delta (v' = R_d·v)
    if getattr(slam.cfg, "is_inertial", False) and "ikf" in shelf:
        ikf_old = shelf["ikf"]
        ikf_cur = slam.ikf
        dst_j = jnp.asarray(kf_dst)
        v_rot = ikf_cur.vel @ R_d.T
        merged = ikf_old._replace(
            vel=ikf_old.vel.at[dst_j].set(v_rot, mode="drop"),
            bg=ikf_old.bg.at[dst_j].set(ikf_cur.bg, mode="drop"),
            ba=ikf_old.ba.at[dst_j].set(ikf_cur.ba, mode="drop"),
            pre_dt=ikf_old.pre_dt.at[dst_j].set(ikf_cur.pre_dt, mode="drop"),
            pre_dR=ikf_old.pre_dR.at[dst_j].set(ikf_cur.pre_dR, mode="drop"),
            pre_dV=ikf_old.pre_dV.at[dst_j].set(ikf_cur.pre_dV, mode="drop"),
            pre_dP=ikf_old.pre_dP.at[dst_j].set(ikf_cur.pre_dP, mode="drop"),
            pre_cov=ikf_old.pre_cov.at[dst_j].set(
                ikf_cur.pre_cov, mode="drop"
            ),
            pre_JRg=ikf_old.pre_JRg.at[dst_j].set(
                ikf_cur.pre_JRg, mode="drop"
            ),
            pre_JVg=ikf_old.pre_JVg.at[dst_j].set(
                ikf_cur.pre_JVg, mode="drop"
            ),
            pre_JVa=ikf_old.pre_JVa.at[dst_j].set(
                ikf_cur.pre_JVa, mode="drop"
            ),
            pre_JPg=ikf_old.pre_JPg.at[dst_j].set(
                ikf_cur.pre_JPg, mode="drop"
            ),
            pre_JPa=ikf_old.pre_JPa.at[dst_j].set(
                ikf_cur.pre_JPa, mode="drop"
            ),
            pre_bg0=ikf_old.pre_bg0.at[dst_j].set(
                ikf_cur.pre_bg0, mode="drop"
            ),
            pre_ba0=ikf_old.pre_ba0.at[dst_j].set(
                ikf_cur.pre_ba0, mode="drop"
            ),
            # the seam edge (old's last KF → cur's first KF) has no
            # preintegration: cur KF0's pre_valid is already False
            pre_valid=ikf_old.pre_valid.at[dst_j].set(
                ikf_cur.pre_valid, mode="drop"
            ),
        )
        slam.ikf = merged
        if shelf.get("imu_initialized", False):
            slam.gravity = shelf["gravity"]
        slam.imu_initialized = (
            shelf.get("imu_initialized", False) or slam.imu_initialized
        )
        if slam.imu_initialized:
            # MergeInertialBA analog (``Optimizer.cc:6029``): after the
            # inertial weld the seam's preintegration chain and the
            # visual-only welding BA above disagree slightly — a bounded
            # whole-map VI BA (reprojection + inertial edges + bias RW)
            # restores IMU consistency across the seam
            from orb_slam3_detailed_comments_kor_tpu.slam import inertial

            slam.ms, slam.ikf, _ = inertial.full_inertial_ba(
                slam.ms, slam.ikf, slam.gravity, slam.cam_params,
                slam.R_cb, slam.t_cb, slam.cfg.camera.bf,
                iters=2, cam_model=slam.cam_model, rig=slam.rig,
            )

    # Re-anchor trajectory records. Relative records survive a rigid map
    # transform unchanged (T_f T_kf⁻¹ is D-invariant); the young map's KF
    # indices moved to kf_dst and the old map's records now belong to the
    # active generation.
    old_gen, cur_gen = shelf["gen"], slam._map_gen
    dst = np.asarray(kf_dst)
    rewritten = []
    for (t, g, kf, R_rel, t_rel, R_abs, t_abs) in slam.trajectory:
        if g == old_gen:
            rewritten.append((t, cur_gen, kf, R_rel, t_rel, R_abs, t_abs))
        elif g == cur_gen and kf >= 0:
            R2, t2 = lie.se3_compose(R_abs, t_abs, Rd_i, td_i)
            rewritten.append((t, cur_gen, int(dst[kf]), R_rel, t_rel, R2, t2))
        else:
            rewritten.append((t, g, kf, R_rel, t_rel, R_abs, t_abs))
    slam.trajectory = rewritten

    del slam.atlas_maps[shelf_idx]
    return True


def try_merge(slam) -> bool:
    """Called after keyframe insertion while shelved maps exist: detect,
    verify, and execute a map merge (LoopClosing merge path)."""
    if not slam.atlas_maps or slam.n_kf < 3:
        return False
    lc = slam.loop_closer
    if lc.vocab is None or lc.db_words is None:
        return False
    kf_cur = slam.n_kf - 1
    bow_cur = (lc.db_words[kf_cur], lc.db_wts[kf_cur])
    for shelf_idx, shelf in enumerate(slam.atlas_maps):
        lc_old = shelf.get("loop_closer")
        if lc_old is None or lc_old.db_words is None:
            continue
        cand, score = detect_merge_candidate(
            bow_cur, (lc_old.db_words, lc_old.db_wts), shelf["n_kf"]
        )
        if cand < 0:
            continue
        import jax as _jax

        slam._loop_key, sub = _jax.random.split(slam._loop_key)
        cam = slam.cfg.camera
        ok, R_d, t_d = verify_merge(
            slam.ms, kf_cur, shelf["ms"], cand, sub,
            cam_params=slam.cam_params, bf=cam.bf,
            w=cam.width, h=cam.height,
            scale=slam.cfg.orb.scale_factor, n_levels=slam.cfg.orb.n_levels,
        )
        if not ok:
            continue
        if not _merge_gate_allows(slam, shelf, R_d, t_d):
            slam.stats["merges_rejected_gate"] = (
                slam.stats.get("merges_rejected_gate", 0) + 1
            )
            continue
        if merge_into_shelved(slam, shelf_idx, kf_cur, cand, R_d, t_d):
            return True
    return False


def _merge_gate_allows(slam, shelf, R_d, t_d) -> bool:
    """Merge-plausibility gate (the cross-map analog of the loop-closing
    drift gate, ``system._loop_gate_allows``): the new map was born at the
    old map's last tracked pose, so the merge transform D (new->old,
    X_old = R_d X + t_d) must stay within drift-plausible range of
    D_expected = T_cw_loss^-1. Aliased merges in self-similar environments
    pass BoW + PnP verification with transforms tens of metres off (r5
    corridor run, frame ~2400: a 40 m warp); honest splits re-join within
    the drift accumulated since the split. Metric modes only — mono scale
    drift makes the prior unreliable. Missing prior (old shelves,
    reloc-switch shelves) skips the gate."""
    from orb_slam3_detailed_comments_kor_tpu.config import SensorType

    prior = shelf.get("merge_prior")
    if prior is None or slam.cfg.sensor == SensorType.MONOCULAR:
        return True
    R_loss, t_loss = prior[0], prior[1]
    c = np.asarray(slam.camera_center())
    d_hyp = np.asarray(R_d) @ c + np.asarray(t_d)
    d_exp = R_loss.T @ (c - t_loss)
    disp = float(np.linalg.norm(d_hyp - d_exp))
    # rotation deviation: a wrong transform can match the CURRENT camera
    # center yet rotate the rest of the map away (observed: an in-budget
    # aliased corridor merge warped the trajectory by tens of metres);
    # odometry yaw drift over a split is degrees, not tens of degrees
    R_err = np.asarray(R_d) @ R_loss  # hyp ∘ expected⁻¹ (R_exp = R_loss.T)
    ang = float(np.degrees(np.arccos(
        np.clip((np.trace(R_err) - 1.0) / 2.0, -1.0, 1.0)
    )))
    if ang > 25.0:
        return False
    # arc traveled in the NEW map since the split (keyframe centers)
    n = slam.n_kf
    Rk = np.asarray(slam.ms.kf_R_cw[:n])
    tk = np.asarray(slam.ms.kf_t_cw[:n])
    centers = -np.einsum("kji,kj->ki", Rk, tk)
    arc = float(np.linalg.norm(np.diff(centers, axis=0), axis=1).sum())
    # Base term: motion while tracking is lost is only loosely bounded (a
    # covered camera can be carried), so the base is metres, not the loop
    # gate's centimetre floor; the gate exists to kill the tens-of-metres
    # aliases, not honest hand-offs. Plus unbounded-arc drift for the
    # post-split mapped excursion and the blackout duration.
    t_loss = prior[2] if len(prior) > 2 else 0.0
    coast_s = prior[3] if len(prior) > 3 else 0.0
    kt = slam._host_kf_times()
    gap_s = max(float(kt[0]) - t_loss, 0.0) if len(kt) else 0.0
    budget = (
        2.0 + 10.0 * max(slam.baseline, 0.01)
        + 0.25 * arc
        + 1.0 * min(gap_s, 10.0)
        # blind-coast drift allowance: the recorded loss pose is an IMU
        # dead-reckoned estimate over coast_s seconds of failed tracking
        # (~0.5 m/s of credible IMU-only drift at handheld dynamics)
        + 0.5 * min(coast_s, 10.0)
    )
    return disp <= budget
