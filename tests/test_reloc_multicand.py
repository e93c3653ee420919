"""Multi-candidate relocalization (``DetectRelocalizationCandidates``,
``src/KeyFrameDatabase.cc:733`` + per-candidate RANSAC loop,
``src/Tracking.cc:3734-3954``): an aliased best BoW score must not kill
recovery when the true place is ranked lower.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.models import vocabulary as voc
from orb_slam3_detailed_comments_kor_tpu.slam import frontend
from orb_slam3_detailed_comments_kor_tpu.slam.system import (
    SlamSystem, TrackingState, reloc_candidate_groups,
)
from orb_slam3_detailed_comments_kor_tpu.utils import lie

import sys
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import BASELINE, FX, H, W, small_config


def test_candidate_groups_prefer_group_over_aliased_individual():
    """Two covisibility cliques. The alias (clique B) holds the single
    highest INDIVIDUAL score, but clique A accumulates more support —
    group accumulation must rank A's best member first and still retain
    the alias as a later candidate."""
    n = 8
    cov = np.zeros((n, n))
    for grp in ((0, 1, 2, 3), (4, 5, 6, 7)):
        for i in grp:
            for j in grp:
                if i != j:
                    cov[i, j] = 30.0
    scores = np.array([0.5, 0.7, 0.6, 0.4, 0.05, 0.95, 0.02, 0.04])
    cands = reloc_candidate_groups(cov, scores)
    # group A sums 2.2 vs alias group 1.06: A's best member (1) first
    assert cands[0] == 1
    # the alias group is above 0.75*best? 1.06 < 1.65 -> dropped entirely
    assert 5 not in cands
    # raise alias group above the floor: it must appear second, not first
    scores2 = scores.copy()
    scores2[4] = 0.9
    cands2 = reloc_candidate_groups(cov, scores2)
    assert cands2[0] == 1 and 5 in cands2


def _pose(i):
    """Strafe (region A), then yaw 180° in place, then strafe (region B)."""
    if i < 25:
        return np.eye(3), np.array([0.03 * i, 0.0, 0.0])
    if i < 65:
        a = (i - 24) / 40.0 * np.pi
        R = np.asarray(lie.so3_exp(jnp.array([0.0, a, 0.0])))
        return R, np.array([0.75, 0.0, 0.0])
    R = np.asarray(lie.so3_exp(jnp.array([0.0, np.pi, 0.0])))
    return R, np.array([0.75 - 0.03 * (i - 64), 0.0, 0.0])


def test_aliased_best_score_rank2_relocalizes():
    cfg = small_config()
    slam = SlamSystem(cfg)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()

    def render(i):
        R, t = _pose(i)
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(R), jnp.asarray(t), BASELINE, scene,
            h=H, w=W,
        )
        return il, ir

    for i in range(90):
        il, ir = render(i)
        slam.track_stereo(il, ir, i / 20.0)
    slam.flush_decisions()
    assert slam.state == TrackingState.OK
    n_kf = slam.n_kf
    assert n_kf >= 12

    # query: a region-A view (early pose, already mapped)
    il, ir = render(3)
    frame = frontend.process_stereo(
        jnp.asarray(il, jnp.float32), jnp.asarray(ir, jnp.float32),
        cfg.camera.bf, n_features=cfg.orb.n_features,
        n_levels=cfg.orb.n_levels, scale=cfg.orb.scale_factor,
        cell=cfg.orb.cell_size,
    )

    # forge an alias: the LAST keyframe (region B, 180° away — not
    # covisible with region A) gets the query's own BoW row, making it the
    # top individual score, and garbage descriptors so geometric
    # verification against it must fail
    lc = slam.loop_closer
    q_ids, q_wts = voc.sparse_bow(
        lc.vocab, voc.transform(lc.vocab, frame.desc, frame.valid),
        frame.valid,
    )
    alias = n_kf - 1
    lc.db_words = lc.db_words.at[alias].set(q_ids)
    lc.db_wts = lc.db_wts.at[alias].set(q_wts * 1.0)
    rng = np.random.default_rng(0)
    junk = jnp.asarray(
        rng.integers(0, 2**32, size=slam.ms.kf_desc[alias].shape,
                     dtype=np.uint32)
    )
    slam.ms = slam.ms._replace(
        kf_desc=slam.ms.kf_desc.at[alias].set(junk)
    )

    scores = np.array(
        voc.sparse_l1_score(q_ids, q_wts, lc.db_words, lc.db_wts)
    )
    scores[n_kf:] = -1.0
    assert int(scores.argmax()) == alias, "alias must top the raw scores"
    # single-candidate (argmax) behavior fails on the alias
    assert slam._reloc_attempt(frame, slam.ms, alias) is None
    # multi-candidate relocalization recovers the true region-A pose
    assert slam._relocalize(frame)
    # render poses are camera→world: the recovered camera CENTER must land
    # at the query pose's position t
    _, t_gt = _pose(3)
    c_est = np.asarray(-np.asarray(slam.R_cw).T @ np.asarray(slam.t_cw))
    assert np.linalg.norm(c_est - t_gt) < 0.15, (c_est, t_gt)
