"""Loop closing: place recognition + loop correction + pose-graph + GBA.

Host-side orchestrator mirroring ``LoopClosing::Run``
(``src/LoopClosing.cc:56``): per keyframe — BoW candidate search
(KeyFrameDatabase::DetectNBestCandidates, ``KeyFrameDatabase.cc:604``),
temporal-consistency gating (≥3 consecutive confirmations,
``LoopClosing.cc:447,502``), geometric verification with 3-D Horn RANSAC
(``Sim3Solver``), then loop correction: essential-graph pose optimization
(``CorrectLoop`` → ``Optimizer::OptimizeEssentialGraph``) with landmark
re-anchoring, optionally followed by global BA
(``RunGlobalBundleAdjustment``).

The vocabulary is trained online from the first keyframes' descriptors
(the reference's 1M-word offline DBoW2 vocabulary is stripped from the
repo — SURVEY.md caveats; a compact domain-trained tree has equivalent
recall at this map scale).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.models import vocabulary as voc
from orb_slam3_detailed_comments_kor_tpu.ops import matching, orb as orb_ops, ransac
from orb_slam3_detailed_comments_kor_tpu.optim import ba, factors, pose_graph
from orb_slam3_detailed_comments_kor_tpu.slam import map_state as msx
from orb_slam3_detailed_comments_kor_tpu.utils import lie


class LoopCloser:
    """Per-map place recognition database + loop correction."""

    def __init__(
        self,
        max_kf: int,
        vocab_k: int = 8,
        vocab_depth: int = 3,
        min_gap: int = 10,
        min_score: float = 0.20,
        min_inliers: int = 20,
        consistency: int = 3,
        vocab: "voc.Vocabulary" = None,
    ):
        self.max_kf = max_kf
        self.vocab_k = vocab_k
        self.vocab_depth = vocab_depth
        self.min_gap = min_gap
        self.min_score = min_score
        self.min_inliers = min_inliers
        self.consistency_needed = consistency
        self.vocab: Optional[voc.Vocabulary] = vocab
        # sparse per-keyframe BoW rows: word ids [K, TOPW] (-1 pad) +
        # L1-normalized tf-idf weights [K, TOPW]. O(features) per keyframe
        # like the reference's inverted file (``KeyFrameDatabase.h:80``) —
        # the dense [K, n_words] matrix was 205 MB/map at the default
        # 512-KF × 100k-word capacity
        self.db_words: Optional[jnp.ndarray] = (
            None if vocab is None
            else jnp.full((max_kf, voc.TOPW), -1, jnp.int32)
        )
        self.db_wts: Optional[jnp.ndarray] = (
            None if vocab is None else jnp.zeros((max_kf, voc.TOPW))
        )
        self._train_buf = []
        self._consecutive = 0
        self._last_cand = -1
        self.n_loops_closed = 0
        # deferred detection: (kf_idx, device scores) dispatched at KF k,
        # consumed at KF k+1 (hides the ~90 ms tunnel readback behind the
        # next keyframe's work — loop closing is asynchronous in the
        # reference too, LoopClosing.cc:315)
        self._pending_detect = None
        # live Sim3/SE3 loop hypothesis carried across keyframes:
        # (cand, R, t, s, n_confirm, n_fail) — the
        # DetectAndReffineSim3FromLastKF state (nLoopNumCoincidences /
        # mg2oLoopSlw, ``src/LoopClosing.cc:410-470``)
        self._hyp = None
        #: projection matches required per hypothesis confirmation
        #: (reference nProjMatches floor, LoopClosing.cc:439)
        self.min_proj_matches = 25
        #: geometric confirmations (verify + refinements) to accept
        self.confirmations_needed = 3
        #: keyframes to ignore detection after a closure — the reference
        #: refuses new loops until mnLastLoopKFid+10 (``LoopClosing.cc:455``:
        #: right after a correction the residual mismatch still verifies
        #: geometrically, and re-applying a correction derived from it
        #: compounds instead of fixing). A countdown (not an id) so slot
        #: compaction can't invalidate it.
        self._cooldown = 0
    # ------------------------------------------------------------------
    def add_keyframe(self, kf_idx: int, desc_bits, valid) -> None:
        """Register a keyframe in the BoW database (KeyFrameDatabase::add)."""
        if self.vocab is None:
            self._train_buf.append(
                np.asarray(desc_bits)[np.asarray(valid)]
            )
            if sum(len(b) for b in self._train_buf) >= 3 * (
                self.vocab_k ** self.vocab_depth
            ) or len(self._train_buf) >= 4:
                desc = np.concatenate(self._train_buf, axis=0)
                self.vocab = voc.train_vocabulary(
                    desc, k=self.vocab_k, depth=self.vocab_depth, iters=6
                )
                self.db_words = jnp.full(
                    (self.max_kf, voc.TOPW), -1, jnp.int32
                )
                self.db_wts = jnp.zeros((self.max_kf, voc.TOPW))
                # backfill buffered keyframes
                for idx, d in enumerate(self._train_buf):
                    if len(d) == 0:
                        continue
                    v = jnp.ones((d.shape[0],), bool)
                    ids, wts = voc.sparse_bow_soft_from_desc(
                        self.vocab, jnp.asarray(d), v
                    )
                    self.db_words = self.db_words.at[idx].set(ids)
                    self.db_wts = self.db_wts.at[idx].set(wts)
            return
        self.db_words, self.db_wts = _add_kf_core(
            self.db_words, self.db_wts, jnp.int32(kf_idx), desc_bits, valid,
            self.vocab.centroids, self.vocab.idf,
            self.vocab.k, self.vocab.depth,
        )

    # ------------------------------------------------------------------
    def compact(self, new_of_old) -> None:
        """Remap BoW database rows after keyframe-slot compaction
        (``map_state.compact_keyframes``): row r moves to new_of_old[r];
        rows of culled keyframes are zeroed (KeyFrameDatabase::erase)."""
        if self.db_words is None:
            return
        K = self.db_words.shape[0]
        noo = np.asarray(new_of_old)
        old_of_new = np.full((K,), -1, np.int64)
        kept = noo < K
        old_of_new[noo[kept]] = np.nonzero(kept)[0]
        src = np.where(old_of_new >= 0, old_of_new, 0)
        live = jnp.asarray(old_of_new >= 0)[:, None]
        self.db_words = jnp.where(
            live, self.db_words[jnp.asarray(src)], -1
        )
        self.db_wts = jnp.where(live, self.db_wts[jnp.asarray(src)], 0.0)
        # in-flight detection results index pre-compaction slots
        self._pending_detect = None
        self._consecutive = 0
        self._last_cand = -1
        self._hyp = None

    # ------------------------------------------------------------------
    def detect(self, ms: msx.MapState, kf_idx: int, n_kf: int) -> int:
        """BoW top-3 candidates + temporal consistency. Returns the
        consistent candidate kf or -1.

        Synchronous form (used by tests / offline paths); the live system
        uses :meth:`detect_async` + :meth:`poll_detect` to hide the scalar
        readback latency.
        """
        if self.vocab is None or kf_idx < self.min_gap:
            return -1
        cs = np.asarray(
            _detect_core(
                self.db_words, self.db_wts, ms, jnp.int32(kf_idx),
                jnp.int32(n_kf), self.min_gap,
            )
        )
        return self._consistency_gate(kf_idx, cs)

    def detect_async(self, ms: msx.MapState, kf_idx: int, n_kf: int):
        """Dispatch detection for this KF and return the result for the
        PREVIOUSLY dispatched KF as ``(kf_idx_prev, cand)`` (cand = -1 when
        nothing fired). The one-keyframe lag matches the reference's
        asynchronous LoopClosing queue."""
        out = self.poll_detect()
        if self.vocab is not None and kf_idx >= self.min_gap:
            cs = _detect_core(
                self.db_words, self.db_wts, ms, jnp.int32(kf_idx),
                jnp.int32(n_kf), self.min_gap,
            )
            try:
                cs.copy_to_host_async()
            except AttributeError:
                pass
            self._pending_detect = (kf_idx, cs)
        return out

    def poll_detect(self):
        """Consume the deferred detection, if any. Returns (kf_idx, cand)."""
        pending, self._pending_detect = self._pending_detect, None
        if pending is None:
            return -1, -1
        kf_prev, cs_dev = pending
        return kf_prev, self._consistency_gate(kf_prev, np.asarray(cs_dev))

    def _consistency_gate(self, kf_idx: int, cs) -> int:
        """Temporal-consistency filter over the top-N (cand, score) rows:
        detection fires once ≥``consistency_needed`` consecutive keyframes
        agreed on (nearly) the same place (``LoopClosing.cc:447,502``);
        the alternates keep a near-miss from resetting the streak."""
        if self._cooldown > 0:
            self._cooldown -= 1
            self._consecutive = 0
            self._last_cand = -1
            return -1
        cs = np.atleast_2d(np.asarray(cs))
        cands = [int(c) for c, s in cs if s >= self.min_score and c >= 0]
        if not cands:
            self._consecutive = 0
            self._last_cand = -1
            return -1
        hit = -1
        if self._last_cand >= 0:
            for c in cands:
                if abs(c - self._last_cand) <= 3:
                    hit = c
                    break
        if hit >= 0:
            self._consecutive += 1
            self._last_cand = hit
        else:
            self._consecutive = 1
            self._last_cand = cands[0]
        # alternates tried by verify() if the primary fails geometry
        self._alternates = [c for c in cands if c != self._last_cand]
        if self._consecutive >= self.consistency_needed:
            return self._last_cand
        return -1

    # ------------------------------------------------------------------
    def start_hypothesis(self, cand: int, R, t, s) -> None:
        """Seed the cross-keyframe hypothesis from a successful geometric
        verification whose BoW streak is still short."""
        self._hyp = (cand, R, t, s, 1, 0)

    def hypothesis_step(self, ms: msx.MapState, kf_idx: int, cam_params,
                        cam_model: str = "pinhole",
                        fix_scale: bool = True):
        """Refine the live hypothesis against keyframe ``kf_idx``.

        Returns (accepted, cand, R, t, s): accepted=True once
        ``confirmations_needed`` geometric confirmations accumulated.
        One fused dispatch + one scalar pull per call.
        """
        cand, R, t, s, n_conf, n_fail = self._hyp
        n_inl, R2, t2, s2 = _refine_hyp_core(
            ms, jnp.int32(kf_idx), jnp.int32(cand), R, t, s, cam_params,
            fix_scale=fix_scale, cam_model=cam_model,
        )
        if int(n_inl) >= self.min_proj_matches:
            n_conf += 1
            if n_conf >= self.confirmations_needed:
                self._hyp = None
                return True, cand, R2, t2, s2
            self._hyp = (cand, R2, t2, s2, n_conf, 0)
        else:
            n_fail += 1
            # two consecutive projection failures kill the hypothesis
            # (the reference decrements and drops, LoopClosing.cc:464)
            self._hyp = None if n_fail >= 2 else (cand, R, t, s,
                                                  n_conf, n_fail)
        return False, cand, R, t, s

    def verify(self, ms: msx.MapState, kf_idx: int, cand: int, key,
               fix_scale: bool = True, cam_params=None,
               cam_model: str = "pinhole"):
        """Geometric verification: descriptor match + Sim3 RANSAC gated by
        REPROJECTION error in both keyframes' cameras, followed by a
        Gauss-Newton reprojection refine (``Sim3Solver::CheckInliers`` +
        ``Optimizer::OptimizeSim3``, ``src/Optimizer.cc:3251``). Falls back
        to the 3-D-distance gate when no camera is given (unit tests).

        Returns (ok, R, t, s) with X_correct ≈ s·R·X_drifted + t
        (world→world). fix_scale=False for monocular maps, whose loop
        discrepancy includes scale drift (``Sim3Solver`` with
        bFixScale=false, ``LoopClosing.cc:767``).
        One fused dispatch + one scalar pull.
        """
        if cam_params is None:
            n_inl, R, t, s = _verify_core(
                ms.kf_desc, ms.kf_feat_valid, ms.obs_lm, ms.lm_pos,
                jnp.int32(kf_idx), jnp.int32(cand), key, fix_scale,
            )
        else:
            n_inl, R, t, s = _verify_core_reproj(
                ms, jnp.int32(kf_idx), jnp.int32(cand), key, cam_params,
                fix_scale, cam_model,
            )
        ok = int(n_inl) >= self.min_inliers
        return ok, R, t, s

    # ------------------------------------------------------------------
    def correct(
        self, ms: msx.MapState, ikf_valid_n: int, kf_idx: int, cand: int,
        R_delta, t_delta, cam_params, bf: float, run_gba: bool = True,
        mode: str = "se3", gravity=None, s_delta=None, ikf=None,
    ):
        """CorrectLoop: pose-graph over the essential graph + landmark
        re-anchoring + optional global BA.

        mode selects the essential-graph parametrization, matching the
        reference's dispatch at ``LoopClosing.cc:1239-1245``:
        - "sim3": monocular — per-KF scale absorbs scale drift
          (``Optimizer::OptimizeEssentialGraph``, ``Optimizer.cc:2113``)
        - "4dof": inertial — only yaw+translation move, gravity (the
          world direction in ``gravity``) stays observable
          (``OptimizeEssentialGraph4DoF``, ``Optimizer.cc:7523``)
        - "se3": stereo / RGB-D

        One fused device program over full-capacity arrays (``n_kf`` is a
        traced scalar) so a session compiles it exactly once — the previous
        ``[:n_kf]``-sliced formulation recompiled the whole pose-graph + GBA
        pipeline at every map size it was called with.
        """
        g = (jnp.array([0.0, 9.81, 0.0]) if gravity is None
             else jnp.asarray(gravity))
        sd = jnp.float32(1.0) if s_delta is None else jnp.asarray(s_delta)
        ms, dR_w, s_new = _correct_core(
            ms, jnp.int32(ikf_valid_n), jnp.int32(kf_idx), jnp.int32(cand),
            R_delta, t_delta, sd, cam_params, jnp.float32(bf), g, run_gba,
            mode,
        )
        self.n_loops_closed += 1
        # forensics/logging: closure ends + delta magnitude (rot deg, m)
        ang = float(jnp.degrees(jnp.arccos(jnp.clip(
            (jnp.trace(R_delta) - 1.0) / 2.0, -1.0, 1.0))))
        self.last_closure = (int(kf_idx), int(cand), round(ang, 2),
                             round(float(jnp.linalg.norm(t_delta)), 3),
                             getattr(self, "_closure_src", "?"))
        # reset consistency tracking + any live hypothesis (the map the
        # hypothesis was expressed in just moved under it), and hold
        # detection down for the next keyframes (mnLastLoopKFid+10)
        self._consecutive = 0
        self._last_cand = -1
        self._hyp = None
        self._cooldown = 10
        if ikf is None:
            return ms
        # rotate each keyframe's stored world-frame velocity by its own
        # pose-graph correction (and undo the scale in sim3 mode) — the
        # reference's corrected-Sim3 velocity propagation
        # (``src/LoopClosing.cc:1036-1120``, mVwbBefMerge analog); stale
        # velocities would feed the next VI-BA window a pre-correction frame
        ikf = ikf._replace(
            vel=jnp.einsum("kij,kj->ki", dR_w, ikf.vel) / s_new[:, None]
        )
        return ms, ikf

    # ------------------------------------------------------------------
    def _global_ba(self, ms: msx.MapState, n_kf: int, cam_params, bf: float,
                   cam_model: str = "pinhole", rig=None):
        """Full-map BA (GlobalBundleAdjustemnt analog), matrix-free PCG
        Schur — scales to K×L far beyond the dense coupling."""
        ms, _ = global_ba(ms, cam_params, bf, cam_model=cam_model, rig=rig)
        return ms

    def gba_chunk(self, ms: msx.MapState, cam_params, bf: float,
                  cam_model: str = "pinhole", rig=None):
        """One bounded GBA slice (2 LM iterations). The system dispatches
        these between frames instead of running the whole GBA inside the
        loop-correction call — the chunked analog of the reference's
        backgrounded GBA thread + mbStopGBA abort point
        (``LoopClosing.cc:1269``, ``:1009``): tracking programs interleave
        with the slices in device order, so the post-loop latency spike is
        one slice, not the whole solve. Routes through the device mesh
        when more than one device is available."""
        return global_ba(ms, cam_params, bf, iters=2, cam_model=cam_model,
                         rig=rig)  # -> (ms, cost-or-None)


# fused per-keyframe device programs, module-level so the jit cache is
# shared across SlamSystem/LoopCloser instances: over a remote device
# tunnel every eager op costs a full RTT, so each step must be ONE dispatch
@functools.partial(jax.jit, static_argnames=("k", "depth"))
def _add_kf_core(db_words, db_wts, kf_idx, desc_bits, valid, centroids, idf,
                 k, depth):
    vocab = voc.Vocabulary(centroids=centroids, k=k, depth=depth, idf=idf)
    # exact soft top-K assignment (r5 scheme — see vocabulary.SOFT_K and
    # VOCAB_EVAL.md: vs tree-descent hard words this lifted warped
    # recall@3 0.77 -> 0.88 at matched FP on the held-out eval)
    ids, wts = voc.sparse_bow_soft_from_desc(vocab, desc_bits, valid)
    return db_words.at[kf_idx].set(ids), db_wts.at[kf_idx].set(wts)


#: BoW candidates returned per query (DetectNBestCandidates' nNumCandidates,
#: ``KeyFrameDatabase.cc:604``)
N_CAND = 3


@functools.partial(jax.jit, static_argnames=("min_gap",))
def _detect_core(db_words, db_wts, ms: msx.MapState, kf_idx, n_kf, min_gap):
    """Covisibility-group place-recognition scoring.

    The reference accumulates BoW scores over each candidate's covisibility
    group, takes the N best groups, and returns each group's best member
    (``KeyFrameDatabase::DetectNBestCandidates``, ``KeyFrameDatabase.cc:
    228,604``); the acceptance floor is the lowest score between the query
    and its OWN covisible neighbours (DetectLoopCandidates' minScore).
    Returns [N_CAND, 2]: (member kf, member score), score −1 ⇒ no candidate.
    """
    K = db_words.shape[0]
    scores = voc.sparse_l1_score(
        db_words[kf_idx], db_wts[kf_idx], db_words, db_wts
    )  # [K]
    kk = jnp.arange(K)
    near = (kk > kf_idx - min_gap) & (kk <= kf_idx)
    in_map = (kk < n_kf) & ms.kf_valid

    cov = msx.covisibility_weights(ms, kk)  # [K,K]
    grp = (cov >= 15) | (kk[:, None] == kk[None, :])

    # adaptive floor from the query's own covisible neighbours
    covis_q = (cov[kf_idx] >= 15) & in_map & (kk != kf_idx)
    ref_floor = jnp.min(jnp.where(covis_q, scores, jnp.inf))
    floor = jnp.maximum(
        jnp.where(jnp.isfinite(ref_floor), ref_floor, 0.02), 0.02
    )

    # candidates must be OUTSIDE the query's covisibility group: a keyframe
    # that still shares landmarks with the query is the same place seen
    # continuously, not a loop (the reference excludes
    # GetConnectedKeyFrames, ``KeyFrameDatabase.cc:228`` spConnectedKF) —
    # a pure temporal gap misfires under dense keyframe cadence
    connected = cov[kf_idx] >= 5
    cand_ok = in_map & ~near & ~connected & (scores >= floor)
    s_masked = jnp.where(cand_ok, scores, 0.0)
    acc = jnp.einsum("ck,k->c", grp.astype(jnp.float32), s_masked)
    acc = jnp.where(cand_ok, acc, -1.0)
    _, top = jax.lax.top_k(acc, N_CAND)
    # best member within each winning group
    member_scores = jnp.where(
        grp[top] & cand_ok[None, :], scores[None, :], -1.0
    )  # [N_CAND, K]
    members = jnp.argmax(member_scores, axis=1)
    m_scores = jnp.take_along_axis(
        member_scores, members[:, None], axis=1
    )[:, 0]
    ok = acc[top] > 0
    return jnp.stack(
        [jnp.where(ok, members, -1).astype(jnp.float32),
         jnp.where(ok, m_scores, -1.0)], axis=-1,
    )


@functools.partial(jax.jit, static_argnames=("fix_scale",))
def _verify_core(kf_desc, kf_feat_valid, obs_lm, lm_pos, kf_idx, cand, key,
                 fix_scale: bool = True):
    """Descriptor match between two keyframes' landmark features + Horn
    RANSAC on the matched landmark pairs (Sim3Solver analog)."""
    da = orb_ops.unpack_descriptors(kf_desc[kf_idx])
    db = orb_ops.unpack_descriptors(kf_desc[cand])
    va = kf_feat_valid[kf_idx] & (obs_lm[kf_idx] >= 0)
    vb = kf_feat_valid[cand] & (obs_lm[cand] >= 0)
    res = matching.match_nn_ratio(da, db, va, vb, max_dist=60, ratio=0.85)
    feat_b = jnp.clip(res.idx, 0)
    lm_a = obs_lm[kf_idx]
    lm_b = obs_lm[cand, feat_b]
    pair_ok = res.valid & (lm_a >= 0) & (lm_b >= 0)
    src = lm_pos[jnp.clip(lm_a, 0)]   # current (possibly drifted)
    dst = lm_pos[jnp.clip(lm_b, 0)]   # loop-side (older, anchored)
    rr = ransac.sim3_ransac(
        src, dst, pair_ok, key, n_hyp=192, inlier_th=0.12,
        fix_scale=fix_scale,
    )
    return rr.n_inliers, rr.R, rr.t, rr.s


@functools.partial(jax.jit, static_argnames=("fix_scale", "cam_model"))
def _verify_core_reproj(ms: msx.MapState, kf_idx, cand, key, cam_params,
                        fix_scale: bool = True, cam_model: str = "pinhole"):
    """Reprojection-gated geometric verification (production path)."""
    da = orb_ops.unpack_descriptors(ms.kf_desc[kf_idx])
    db = orb_ops.unpack_descriptors(ms.kf_desc[cand])
    va = ms.kf_feat_valid[kf_idx] & (ms.obs_lm[kf_idx] >= 0)
    vb = ms.kf_feat_valid[cand] & (ms.obs_lm[cand] >= 0)
    res = matching.match_nn_ratio(da, db, va, vb, max_dist=60, ratio=0.85)
    feat_b = jnp.clip(res.idx, 0)
    lm_a = ms.obs_lm[kf_idx]
    lm_b = ms.obs_lm[cand, feat_b]
    pair_ok = res.valid & (lm_a >= 0) & (lm_b >= 0)
    src = ms.lm_pos[jnp.clip(lm_a, 0)]
    dst = ms.lm_pos[jnp.clip(lm_b, 0)]
    s2a = 1.2 ** (2.0 * ms.kf_level[kf_idx].astype(jnp.float32))
    s2b = 1.2 ** (2.0 * ms.kf_level[cand, feat_b].astype(jnp.float32))
    rr = ransac.sim3_ransac_reproj(
        src, dst,
        ms.kf_xy[kf_idx], ms.kf_xy[cand, feat_b],
        s2a, s2b,
        (ms.kf_R_cw[kf_idx], ms.kf_t_cw[kf_idx]),
        (ms.kf_R_cw[cand], ms.kf_t_cw[cand]),
        cam_params, pair_ok, key, n_hyp=192, fix_scale=fix_scale,
        cam_model=cam_model,
    )
    return rr.n_inliers, rr.R, rr.t, rr.s


@functools.partial(jax.jit, static_argnames=("fix_scale", "cam_model"))
def _refine_hyp_core(ms: msx.MapState, kf_idx, cand, R, t, s, cam_params,
                     fix_scale: bool = True, cam_model: str = "pinhole"):
    """Project-and-refine an existing loop hypothesis against a NEW
    keyframe (``LoopClosing::DetectAndReffineSim3FromLastKF``,
    ``src/LoopClosing.cc:410-470``): instead of restarting BoW detection,
    the loop side's landmarks are projected through the propagated warp
    into the new keyframe, matched by projection, and the warp is
    Gauss-Newton-refined on the matches. Returns (n_inliers, R', t', s').

    Warp convention matches ``verify``: X_corrected ≈ s·R·X_current + t
    (world→world), so loop-side points map into the current (drifted)
    frame through the inverse warp.
    """
    from orb_slam3_detailed_comments_kor_tpu.models import camera as cam_mod

    lm_b = ms.obs_lm[cand]
    ok_b = ms.kf_feat_valid[cand] & (lm_b >= 0)
    lm_ids = jnp.clip(lm_b, 0)
    X_loop = ms.lm_pos[lm_ids]
    ok_b = ok_b & ms.lm_valid[lm_ids]
    Rk, tk = ms.kf_R_cw[kf_idx], ms.kf_t_cw[kf_idx]
    s2_feat = 1.2 ** (2.0 * ms.kf_level[kf_idx].astype(jnp.float32))

    def project_cur(R_, t_, s_):
        si = 1.0 / jnp.maximum(s_, 1e-9)
        X_cur = si * ((X_loop - t_) @ R_)
        pc = X_cur @ Rk.T + tk
        return cam_mod.project(cam_params, pc, cam_model), pc[:, 2]

    uv0, z0 = project_cur(R, t, s)
    vis = ok_b & (z0 > 0.05)
    res = matching.search_by_projection(
        uv0, ms.kf_level[cand], orb_ops.unpack_descriptors(ms.lm_desc[lm_ids]),
        vis,
        ms.kf_xy[kf_idx], ms.kf_level[kf_idx],
        orb_ops.unpack_descriptors(ms.kf_desc[kf_idx]),
        ms.kf_feat_valid[kf_idx],
        radius=8.0, max_dist=60,
    )
    feat = jnp.clip(res.idx, 0)
    uv_obs = ms.kf_xy[kf_idx, feat]
    w_m = res.valid.astype(jnp.float32) / jnp.maximum(s2_feat[feat], 1e-6)

    def residuals(params, R0, t0, s0):
        phi, rho, lam = params[:3], params[3:6], params[6]
        dR = lie.so3_exp(phi)
        R_ = dR @ R0
        t_ = dR @ t0 + rho
        s_ = s0 * jnp.exp(jnp.where(fix_scale, 0.0 * lam, lam))
        uv, _ = project_cur(R_, t_, s_)
        return ((uv - uv_obs) * jnp.sqrt(w_m)[:, None]).reshape(-1)

    def gn_step(carry, _):
        R_, t_, s_ = carry
        f = lambda p: residuals(p, R_, t_, s_)
        p0 = jnp.zeros((7,))
        r0 = f(p0)
        J = jax.jacfwd(f)(p0)
        H = J.T @ J + 1e-6 * jnp.eye(7)
        dx = -jnp.linalg.solve(H, J.T @ r0)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dR = lie.so3_exp(dx[:3])
        return (
            dR @ R_, dR @ t_ + dx[3:6],
            s_ * jnp.exp(jnp.where(fix_scale, 0.0, dx[6])),
        ), None

    (R, t, s), _ = jax.lax.scan(gn_step, (R, t, s), None, length=6)
    R = lie.project_to_so3(R)
    uv1, z1 = project_cur(R, t, s)
    chi2 = jnp.sum((uv1 - uv_obs) ** 2, -1) / jnp.maximum(s2_feat[feat], 1e-6)
    inl = res.valid & (chi2 < 9.21) & (z1 > 0.05)
    return jnp.sum(inl), R, t, s


# capacity of strong-covisibility edges in the essential graph; the
# reference thresholds at weight>=100 for covisibility edges
# (Optimizer.cc:2113 region) — top-192 by weight is the masked-static form
_COV_EDGE_CAP = 192


@functools.partial(jax.jit, static_argnames=("run_gba", "mode"))
def _correct_core(
    ms: msx.MapState, n_kf, kf_idx, cand, R_delta, t_delta, s_delta,
    cam_params, bf, gravity, run_gba: bool, mode: str = "se3",
):
    K = ms.K
    # corrected Sim3 pose of the current keyframe: S_cw' = S_cw ∘ D⁻¹
    # (D = (R_delta, t_delta, s_delta), world→world; s_delta = 1 for
    # stereo/RGB-D/inertial, free for monocular)
    Rd_i, td_i, sd_i = lie.sim3_inverse(R_delta, t_delta, s_delta)
    R_corr, t_corr, s_corr = lie.sim3_compose(
        ms.kf_R_cw[kf_idx], ms.kf_t_cw[kf_idx], jnp.float32(1.0),
        Rd_i, td_i, sd_i,
    )

    # essential graph edges: temporal chain + strong covisibility + loop,
    # all at fixed capacity with validity masks
    i_seq = jnp.arange(K - 1)
    j_seq = jnp.arange(1, K)
    e_seq = pose_graph.make_edges_from_poses(
        i_seq, j_seq, ms.kf_R_cw, ms.kf_t_cw
    )
    e_seq = e_seq._replace(valid=j_seq < n_kf)

    cov = msx.covisibility_weights(ms, jnp.arange(K))  # [K, K]
    kk = jnp.arange(K)
    in_map = (kk[:, None] < n_kf) & (kk[None, :] < n_kf)
    upper = kk[None, :] >= kk[:, None] + 2  # skip self + chain neighbours
    w = jnp.where(in_map & upper, cov, 0)
    wf = w.reshape(-1)
    top_w, top_idx = jax.lax.top_k(wf, _COV_EDGE_CAP)
    ii = (top_idx // K).astype(jnp.int32)
    jj = (top_idx % K).astype(jnp.int32)
    e_cov = pose_graph.make_edges_from_poses(
        ii, jj, ms.kf_R_cw, ms.kf_t_cw
    )
    e_cov = e_cov._replace(valid=top_w >= 30)

    Rj_i, tj_i, sj_i = lie.sim3_inverse(
        ms.kf_R_cw[cand], ms.kf_t_cw[cand], jnp.float32(1.0)
    )
    Rl, tl, sl = lie.sim3_compose(
        R_corr, t_corr, s_corr, Rj_i, tj_i, sj_i
    )
    e_loop = pose_graph.PoseGraphEdges(
        i=kf_idx[None], j=cand[None],
        R_meas=Rl[None], t_meas=tl[None], s_meas=sl[None],
        weight=jnp.array([30.0]), valid=jnp.ones((1,), bool),
    )
    edges = jax.tree.map(
        lambda a, b, c: jnp.concatenate([a, b, c]), e_seq, e_cov, e_loop
    )
    # out-of-map slots are held fixed so they contribute nothing
    fixed = (
        (kk == cand) | (kk == 0) | (kk >= n_kf) | ~ms.kf_valid
    )

    R_old = ms.kf_R_cw
    t_old = ms.kf_t_cw
    s_new = jnp.ones((K,))
    if mode == "sim3":
        R_new, t_new, s_new = pose_graph.optimize_pose_graph_sim3(
            ms.kf_R_cw, ms.kf_t_cw, jnp.ones((K,)), edges, fixed, iters=15
        )
        # fold the per-KF scale into the SE3 pose: [R | t/s]
        # (CorrectLoop's eigt /= eigs, LoopClosing.cc:1100 region)
        ms = ms._replace(kf_R_cw=R_new, kf_t_cw=t_new / s_new[:, None])
    elif mode == "4dof":
        R_new, t_new = pose_graph.optimize_pose_graph_4dof(
            ms.kf_R_cw, ms.kf_t_cw, gravity, edges, fixed, iters=15
        )
        ms = ms._replace(kf_R_cw=R_new, kf_t_cw=t_new)
    else:
        R_new, t_new = pose_graph.optimize_pose_graph_se3(
            ms.kf_R_cw, ms.kf_t_cw, edges, fixed, iters=15
        )
        ms = ms._replace(kf_R_cw=R_new, kf_t_cw=t_new)

    # landmark re-anchoring: X' = S_new[a]⁻¹ ∘ S_old[a] (X)  (sim3-aware;
    # s_old = 1 — drift lives in the poses)
    anchor = jnp.clip(ms.lm_first_kf, 0, n_kf - 1)
    Ra_old = R_old[anchor]
    ta_old = t_old[anchor]
    s_a = s_new[anchor]
    Ra_new_i, ta_new_i = lie.se3_inverse(R_new[anchor], t_new[anchor])
    pc = jnp.einsum("lij,lj->li", Ra_old, ms.lm_pos) + ta_old
    X_new = (
        jnp.einsum("lij,lj->li", Ra_new_i, pc) + ta_new_i
    ) / s_a[:, None]
    # per-KF world-frame correction ΔR_w = R_wc_new ∘ R_cw_old: rotates any
    # world-frame vector attached to that keyframe into the corrected frame
    # (the reference rotates body velocities and re-expresses map-point
    # normals through the corrected Sim3, ``src/LoopClosing.cc:1036-1120``)
    dR_w = jnp.einsum("kji,kjl->kil", R_new, R_old)  # R_newᵀ @ R_old per KF
    n_rot = jnp.einsum("lij,lj->li", dR_w[anchor], ms.lm_normal)
    ms = ms._replace(
        lm_pos=jnp.where(ms.lm_valid[:, None], X_new, ms.lm_pos),
        lm_normal=jnp.where(ms.lm_valid[:, None], n_rot, ms.lm_normal),
        lm_min_dist=ms.lm_min_dist / s_a,
        lm_max_dist=ms.lm_max_dist / s_a,
    )
    if run_gba:
        ms, _ = _global_ba_core(ms, cam_params, bf)
    return ms, dR_w, s_new  # (run_gba callers are pinhole-only tests)


def map_observations(ms: msx.MapState, with_rig: bool = False):
    """Flat Observations table + fixed masks over the whole map state.

    with_rig: append one right-camera row per feature slot (ToBody edges,
    fisheye rigs) — see ``factors.with_rig_rows``."""
    K, N = ms.K, ms.N
    kf_col = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[:, None], (K, N)
    )
    obs_rows = ms.obs_lm
    feat_ok = ms.kf_feat_valid & (obs_rows >= 0) & ms.kf_valid[:, None]
    inv_s2 = 1.0 / (1.2 ** (2.0 * ms.kf_level.astype(jnp.float32)))
    obs = factors.Observations(
        kf=kf_col.reshape(-1),
        lm=jnp.clip(obs_rows, 0).reshape(-1),
        uv=ms.kf_xy.reshape(-1, 2),
        u_right=ms.kf_ur.reshape(-1),
        inv_sigma2=inv_s2.reshape(-1),
        valid=feat_ok.reshape(-1),
    )
    if with_rig:
        obs = factors.with_rig_rows(obs, ms.kf_uvr.reshape(-1, 2))
    fixed_pose = ~ms.kf_valid | (jnp.arange(K) == 0)
    fixed_point = ~ms.lm_valid
    return obs, fixed_pose, fixed_point


@functools.partial(jax.jit, static_argnames=("iters", "cam_model"))
def _global_ba_core(ms: msx.MapState, cam_params, bf, iters: int = 8,
                    cam_model: str = "pinhole", rig=None):
    """Whole-map BA via the matrix-free PCG Schur solver: memory is
    O(obs), not O(K·L) — the dense coupling was ~75 MB per einsum operand
    at bench capacity and unusable at K≥256/L≥64k (VERDICT r1 weak-3).

    On a multi-device runtime (pod slice / multi-host mesh) the caller
    should use :func:`global_ba` which routes through the obs-sharded
    ``parallel.dist_ba.distributed_bundle_adjust_cg`` instead.
    """
    obs, fixed_pose, fixed_point = map_observations(
        ms, with_rig=rig is not None
    )
    res = ba.bundle_adjust_cg(
        ms.kf_R_cw, ms.kf_t_cw, ms.lm_pos, obs,
        fixed_pose, fixed_point, cam_params, bf, iters=iters, cg_iters=24,
        cam_model=cam_model, rig=rig,
    )
    cost = jnp.sum(res.chi2 * obs.valid)
    return ms._replace(kf_R_cw=res.R_cw, kf_t_cw=res.t_cw,
                       lm_pos=res.X), cost


_GBA_MESH = None


def global_ba(ms: msx.MapState, cam_params, bf, iters: int = 8,
              cam_model: str = "pinhole", rig=None):
    """Production GBA dispatch: single-chip jitted PCG Schur, or — when
    the runtime exposes more than one device — the observation-sharded
    distributed variant with ``psum`` reduction over the mesh (SURVEY §2.4
    communication-backend plan). One mesh is built per process."""
    global _GBA_MESH
    if len(jax.devices()) > 1:
        from orb_slam3_detailed_comments_kor_tpu.parallel import dist_ba

        if _GBA_MESH is None or _GBA_MESH.devices.size != len(jax.devices()):
            _GBA_MESH = dist_ba.make_mesh()
        obs, fixed_pose, fixed_point = map_observations(
            ms, with_rig=rig is not None
        )
        R, t, X = dist_ba.distributed_bundle_adjust_cg(
            _GBA_MESH, ms.kf_R_cw, ms.kf_t_cw, ms.lm_pos, obs,
            fixed_pose, fixed_point, cam_params, jnp.float32(bf),
            iters=iters, cg_iters=24, cam_model=cam_model, rig=rig,
        )
        return ms._replace(kf_R_cw=R, kf_t_cw=t, lm_pos=X), None
    return _global_ba_core(ms, cam_params, jnp.float32(bf), iters=iters,
                           cam_model=cam_model, rig=rig)
