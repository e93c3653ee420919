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
        min_score: float = 0.12,
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
        self.bow_db: Optional[jnp.ndarray] = (
            None if vocab is None else jnp.zeros((max_kf, vocab.n_words))
        )
        self._train_buf = []
        self._consecutive = 0
        self._last_cand = -1
        self.n_loops_closed = 0

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
                self.bow_db = jnp.zeros(
                    (self.max_kf, self.vocab.n_words)
                )
                # backfill buffered keyframes
                for idx, d in enumerate(self._train_buf):
                    if len(d) == 0:
                        continue
                    v = jnp.ones((d.shape[0],), bool)
                    words = voc.transform(self.vocab, jnp.asarray(d), v)
                    self.bow_db = self.bow_db.at[idx].set(
                        voc.bow_vector(self.vocab, words, v)
                    )
            return
        words = voc.transform(self.vocab, desc_bits, valid)
        bow = voc.bow_vector(self.vocab, words, valid)
        self.bow_db = self.bow_db.at[kf_idx].set(bow)

    # ------------------------------------------------------------------
    def detect(self, kf_idx: int, n_kf: int) -> int:
        """BoW candidate + temporal consistency. Returns candidate kf or -1."""
        if self.vocab is None or kf_idx < self.min_gap:
            return -1
        scores = np.array(
            voc.score_against_database(self.bow_db[kf_idx], self.bow_db[:n_kf])
        )  # np.array (copy): np.asarray of a jax array is read-only
        # exclude temporally-near keyframes (the reference excludes
        # covisible ones; temporal distance is the stereo-rig equivalent)
        lo = max(0, kf_idx - self.min_gap)
        scores[lo: kf_idx + 1] = -1.0
        cand = int(scores.argmax())
        if scores[cand] < self.min_score:
            self._consecutive = 0
            self._last_cand = -1
            return -1
        if self._last_cand >= 0 and abs(cand - self._last_cand) <= 3:
            self._consecutive += 1
        else:
            self._consecutive = 1
        self._last_cand = cand
        if self._consecutive >= self.consistency_needed:
            return cand
        return -1

    # ------------------------------------------------------------------
    def verify(self, ms: msx.MapState, kf_idx: int, cand: int, key):
        """Geometric verification: descriptor match + 3-D Horn RANSAC.

        Returns (ok, R, t) with X_correct ≈ R·X_drifted + t (world→world).
        """
        da = orb_ops.unpack_descriptors(ms.kf_desc[kf_idx])
        db = orb_ops.unpack_descriptors(ms.kf_desc[cand])
        va = ms.kf_feat_valid[kf_idx] & (ms.obs_lm[kf_idx] >= 0)
        vb = ms.kf_feat_valid[cand] & (ms.obs_lm[cand] >= 0)
        res = matching.match_nn_ratio(da, db, va, vb, max_dist=60, ratio=0.85)
        feat_b = jnp.clip(res.idx, 0)
        lm_a = ms.obs_lm[kf_idx]
        lm_b = ms.obs_lm[cand, feat_b]
        pair_ok = res.valid & (lm_a >= 0) & (lm_b >= 0)
        src = ms.lm_pos[jnp.clip(lm_a, 0)]   # current (possibly drifted)
        dst = ms.lm_pos[jnp.clip(lm_b, 0)]   # loop-side (older, anchored)
        rr = ransac.sim3_ransac(
            src, dst, pair_ok, key, n_hyp=192, inlier_th=0.12, fix_scale=True
        )
        ok = int(rr.n_inliers) >= self.min_inliers
        return ok, rr.R, rr.t

    # ------------------------------------------------------------------
    def correct(
        self, ms: msx.MapState, ikf_valid_n: int, kf_idx: int, cand: int,
        R_delta, t_delta, cam_params, bf: float, run_gba: bool = True,
    ) -> msx.MapState:
        """CorrectLoop: pose-graph over the essential graph + landmark
        re-anchoring + optional global BA."""
        n_kf = ikf_valid_n
        K = ms.K
        # corrected pose of the current keyframe: T_cw' = T_cw ∘ D⁻¹
        Rd_i, td_i = lie.se3_inverse(R_delta, t_delta)
        R_corr, t_corr = lie.se3_compose(
            ms.kf_R_cw[kf_idx], ms.kf_t_cw[kf_idx], Rd_i, td_i
        )

        # essential graph edges: temporal chain + strong covisibility
        i_seq = jnp.arange(n_kf - 1)
        j_seq = jnp.arange(1, n_kf)
        e_seq = pose_graph.make_edges_from_poses(
            i_seq, j_seq, ms.kf_R_cw, ms.kf_t_cw
        )
        cov = msx.covisibility_weights(ms, jnp.arange(n_kf))  # [n_kf, K]
        cov_np = np.asarray(cov)[:, :n_kf]
        ii, jj = np.nonzero(np.triu(cov_np, k=2) >= 30)
        if len(ii) > 0:
            e_cov = pose_graph.make_edges_from_poses(
                jnp.asarray(ii), jnp.asarray(jj), ms.kf_R_cw, ms.kf_t_cw
            )
            edges = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b]), e_seq, e_cov
            )
        else:
            edges = e_seq
        # loop edge with the corrected relative measurement, high weight
        Rj_i, tj_i = lie.se3_inverse(ms.kf_R_cw[cand], ms.kf_t_cw[cand])
        Rl, tl = lie.se3_compose(R_corr, t_corr, Rj_i, tj_i)
        e_loop = pose_graph.PoseGraphEdges(
            i=jnp.array([kf_idx], jnp.int32),
            j=jnp.array([cand], jnp.int32),
            R_meas=Rl[None], t_meas=tl[None], s_meas=jnp.ones((1,)),
            weight=jnp.array([30.0]), valid=jnp.ones((1,), bool),
        )
        edges = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b]), edges, e_loop
        )
        fixed = jnp.zeros((n_kf,), bool).at[cand].set(True).at[0].set(True)

        R_old = ms.kf_R_cw
        t_old = ms.kf_t_cw
        R_new, t_new = pose_graph.optimize_pose_graph_se3(
            ms.kf_R_cw[:n_kf], ms.kf_t_cw[:n_kf], edges, fixed, iters=15
        )
        ms = ms._replace(
            kf_R_cw=ms.kf_R_cw.at[:n_kf].set(R_new),
            kf_t_cw=ms.kf_t_cw.at[:n_kf].set(t_new),
        )

        # landmark re-anchoring: X' = T_wc_new[a] ∘ T_cw_old[a] (X)
        anchor = jnp.clip(ms.lm_first_kf, 0, n_kf - 1)
        Ra_old = R_old[anchor]
        ta_old = t_old[anchor]
        Ra_new_i, ta_new_i = lie.se3_inverse(
            ms.kf_R_cw[anchor], ms.kf_t_cw[anchor]
        )
        pc = jnp.einsum("lij,lj->li", Ra_old, ms.lm_pos) + ta_old
        X_new = jnp.einsum("lij,lj->li", Ra_new_i, pc) + ta_new_i
        ms = ms._replace(
            lm_pos=jnp.where(ms.lm_valid[:, None], X_new, ms.lm_pos)
        )

        if run_gba:
            ms = self._global_ba(ms, n_kf, cam_params, bf)
        self.n_loops_closed += 1
        # reset consistency tracking
        self._consecutive = 0
        self._last_cand = -1
        return ms

    # ------------------------------------------------------------------
    def _global_ba(self, ms: msx.MapState, n_kf: int, cam_params, bf: float):
        """Full-map BA (GlobalBundleAdjustemnt analog) — viable at current
        capacities in one shot; larger maps will chunk the Schur coupling."""
        K, N, L = ms.K, ms.N, ms.L
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
        fixed_pose = ~ms.kf_valid | (jnp.arange(K) == 0)
        fixed_point = ~ms.lm_valid
        res = ba.bundle_adjust(
            ms.kf_R_cw, ms.kf_t_cw, ms.lm_pos, obs,
            fixed_pose, fixed_point, cam_params, bf, iters=8,
        )
        return ms._replace(kf_R_cw=res.R_cw, kf_t_cw=res.t_cw, lm_pos=res.X)
