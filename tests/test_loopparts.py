"""Tests for loop-closing building blocks: vocabulary, Sim3 RANSAC,
PnP relocalization, pose-graph optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.models import vocabulary as voc
from orb_slam3_detailed_comments_kor_tpu.ops import ransac
from orb_slam3_detailed_comments_kor_tpu.optim import pose_graph
from orb_slam3_detailed_comments_kor_tpu.utils import lie

KEY = jax.random.PRNGKey(2)


def random_descriptors(key, n, n_clusters=20, flip=0.05):
    """Clustered binary descriptors (so a vocabulary has structure)."""
    k1, k2, k3 = jax.random.split(key, 3)
    protos = jax.random.bernoulli(k1, 0.5, (n_clusters, 256))
    assign = jax.random.randint(k2, (n,), 0, n_clusters)
    noise = jax.random.bernoulli(k3, flip, (n, 256))
    return jnp.logical_xor(protos[assign], noise).astype(jnp.uint8), assign


class TestVocabulary:
    @pytest.fixture(scope="class")
    def vocab(self):
        desc, _ = random_descriptors(KEY, 3000)
        return voc.train_vocabulary(np.asarray(desc), k=5, depth=3, iters=5)

    def test_transform_shapes(self, vocab):
        desc, _ = random_descriptors(jax.random.PRNGKey(3), 200)
        words = voc.transform(vocab, desc, jnp.ones((200,), bool))
        assert words.shape == (200,)
        assert int(words.min()) >= 0 and int(words.max()) < vocab.n_words

    def test_similar_descriptors_same_word(self, vocab):
        desc, assign = random_descriptors(jax.random.PRNGKey(4), 400, flip=0.02)
        words = voc.transform(vocab, desc, jnp.ones((400,), bool))
        # same-cluster descriptors should mostly map to the same word
        words = np.asarray(words)
        assign = np.asarray(assign)
        agree = 0
        total = 0
        for c in np.unique(assign):
            w = words[assign == c]
            if len(w) > 1:
                agree += (w == np.bincount(w).argmax()).sum()
                total += len(w)
        assert agree / total > 0.6, agree / total  # greedy-tree quantization bound

    def test_bow_scoring_discriminates(self, vocab):
        k = jax.random.PRNGKey(5)
        desc_a, _ = random_descriptors(k, 300, flip=0.02)
        # same scene (small noise) vs different scene
        desc_a2 = jnp.logical_xor(
            desc_a, jax.random.bernoulli(k, 0.01, desc_a.shape)
        ).astype(jnp.uint8)
        desc_b, _ = random_descriptors(jax.random.PRNGKey(99), 300, flip=0.02)
        ones = jnp.ones((300,), bool)
        bow_a = voc.bow_vector(vocab, voc.transform(vocab, desc_a, ones), ones)
        bow_a2 = voc.bow_vector(vocab, voc.transform(vocab, desc_a2, ones), ones)
        bow_b = voc.bow_vector(vocab, voc.transform(vocab, desc_b, ones), ones)
        s_same = float(voc.l1_score(bow_a, bow_a2))
        s_diff = float(voc.l1_score(bow_a, bow_b))
        assert s_same > s_diff + 0.2, (s_same, s_diff)


class TestSim3Ransac:
    def test_recovers_transform_with_outliers(self):
        key = jax.random.PRNGKey(6)
        src = jax.random.uniform(key, (100, 3), minval=-3, maxval=3)
        R_gt = lie.so3_exp(jnp.array([0.2, -0.3, 0.5]))
        t_gt = jnp.array([1.0, -2.0, 0.5])
        dst = src @ R_gt.T + t_gt
        # 30% outliers
        out = jax.random.uniform(key, (100,)) < 0.3
        dst = jnp.where(out[:, None], dst + 5.0, dst)
        res = ransac.sim3_ransac(
            src, dst, jnp.ones((100,), bool), key, n_hyp=128, inlier_th=0.05
        )
        assert int(res.n_inliers) >= 60
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_gt), atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=1e-2)

    def test_scale_estimation(self):
        key = jax.random.PRNGKey(7)
        src = jax.random.uniform(key, (50, 3), minval=-2, maxval=2)
        R_gt = lie.so3_exp(jnp.array([0.1, 0.2, -0.1]))
        s_gt = 1.7
        dst = s_gt * (src @ R_gt.T) + jnp.array([0.3, 0.0, -0.2])
        res = ransac.sim3_ransac(
            src, dst, jnp.ones((50,), bool), key, fix_scale=False,
            inlier_th=0.05,
        )
        assert abs(float(res.s) - s_gt) < 0.02


class TestPnPRansac:
    def test_relocalization_pose(self):
        key = jax.random.PRNGKey(8)
        CAM = jnp.array([230.0, 230.0, 188.0, 120.0])
        X = jax.random.uniform(
            key, (150, 3), minval=jnp.array([-2.0, -1.5, 3.0]),
            maxval=jnp.array([2.0, 1.5, 8.0]),
        )
        R_gt = lie.so3_exp(jnp.array([0.1, -0.2, 0.05]))
        t_gt = jnp.array([0.4, -0.1, 0.6])
        pc = X @ R_gt.T + t_gt
        uv = jnp.stack(
            [230.0 * pc[:, 0] / pc[:, 2] + 188.0,
             230.0 * pc[:, 1] / pc[:, 2] + 120.0], axis=-1
        )
        # 25% outliers
        out = jax.random.uniform(key, (150,)) < 0.25
        uv = jnp.where(out[:, None], uv + 60.0, uv)
        R, t, inl, n = ransac.pnp_ransac(
            X, uv, jnp.ones((150,), bool), CAM, key, n_hyp=128
        )
        assert int(n) > 80
        rot_err = np.linalg.norm(np.asarray(lie.so3_log(R @ R_gt.T)))
        assert np.degrees(rot_err) < 1.0
        assert float(jnp.linalg.norm(t - t_gt)) < 0.05


class TestPoseGraph:
    def test_loop_closure_distributes_drift(self):
        """Chain of 20 poses with accumulated drift; a loop edge from the
        last to the first (with the TRUE relative pose) pulls the chain
        back (CorrectLoop essential-graph semantics)."""
        K = 20
        # ground truth: circle-ish path
        t_gt = jnp.stack(
            [jnp.sin(jnp.arange(K) * 0.3), jnp.arange(K) * 0.1,
             jnp.zeros(K)], axis=-1
        )
        R_gt = lie.so3_exp(
            jnp.stack([jnp.zeros(K), jnp.arange(K) * 0.05, jnp.zeros(K)], -1)
        )
        # drifted estimate: growing error
        drift = jnp.stack(
            [jnp.arange(K) * 0.02, jnp.zeros(K), jnp.arange(K) * 0.015], -1
        )
        t_est = t_gt + drift
        R_est = R_gt
        # edges: consecutive (from drifted estimates = consistent with est)
        i_seq = jnp.arange(K - 1)
        j_seq = jnp.arange(1, K)
        e_seq = pose_graph.make_edges_from_poses(i_seq, j_seq, R_est, t_est)
        # loop edge 19→0 with TRUE relative pose, high weight
        Ri, ti = R_gt[19], t_gt[19]
        Rji, tji = lie.se3_inverse(R_gt[0], t_gt[0])
        Rl, tl = lie.se3_compose(Ri, ti, Rji, tji)
        e_loop = pose_graph.PoseGraphEdges(
            i=jnp.array([19], jnp.int32), j=jnp.array([0], jnp.int32),
            R_meas=Rl[None], t_meas=tl[None], s_meas=jnp.ones((1,)),
            weight=jnp.array([20.0]), valid=jnp.ones((1,), bool),
        )
        edges = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b]), e_seq, e_loop
        )
        fixed = jnp.zeros((K,), bool).at[0].set(True)
        R_opt, t_opt = pose_graph.optimize_pose_graph_se3(
            R_est, t_est, edges, fixed, iters=20
        )
        err_before = float(jnp.abs(t_est - t_gt).max())
        err_after = float(jnp.abs(t_opt - t_gt).max())
        # loop edge should cut the endpoint error substantially
        end_before = float(jnp.linalg.norm(t_est[19] - t_gt[19]))
        end_after = float(jnp.linalg.norm(t_opt[19] - t_gt[19]))
        assert end_after < 0.3 * end_before, (end_before, end_after)
        assert err_after < err_before


class TestIdentityNullHypothesis:
    """sim3_ransac_reproj must prefer "no correction" over a tight aliased
    cluster when the map is already consistent (regression: a 3-point fit
    on 25 texture-aliased pairs beat the drift-spread true cluster and a
    0.63 m warp corrupted a 3000-frame run whose real inconsistency was
    0.03 m)."""

    def _make(self, n_true=60, n_alias=25, drift=0.03, offset=0.5, seed=0):
        rng = np.random.default_rng(seed)
        fx = 458.0
        cam = jnp.array([fx, fx, 376.0, 240.0])
        # two keyframes looking at a wall ~3 m away, ~0.4 m apart
        Ra = np.eye(3)
        ta = np.zeros(3)
        Rb = np.eye(3)
        tb = np.array([0.4, 0.0, 0.0])
        X = rng.uniform([-2, -1.5, 2.5], [2, 1.5, 4.0], (n_true + n_alias, 3))
        # true pairs: same physical point, duplicate entries differ by the
        # map's internal drift scatter
        src = X.copy()
        dst = X + rng.normal(0, drift / np.sqrt(3), X.shape)
        # aliased pairs: dst is the NEXT texture cell over — exactly
        # offset by a consistent world shift, zero scatter
        dst[n_true:] = X[n_true:] + np.array([offset, 0.0, 0.0])

        def proj(R, t, P):
            pc = P @ R.T + t
            return np.stack(
                [fx * pc[:, 0] / pc[:, 2] + 376.0,
                 fx * pc[:, 1] / pc[:, 2] + 240.0], -1)

        # observed pixels come from each side's own entry (consistent with
        # each keyframe's view of its own landmark)
        uv_a = proj(Ra, ta, src)
        uv_b = proj(Rb, tb, dst)
        s2 = np.ones(n_true + n_alias)
        return (jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
                jnp.asarray(uv_a, jnp.float32), jnp.asarray(uv_b, jnp.float32),
                jnp.asarray(s2), jnp.asarray(s2),
                (jnp.asarray(Ra, jnp.float32), jnp.asarray(ta, jnp.float32)),
                (jnp.asarray(Rb, jnp.float32), jnp.asarray(tb, jnp.float32)),
                cam)

    def test_consistent_map_yields_near_identity(self):
        src, dst, uv_a, uv_b, s2a, s2b, pa, pb, cam = self._make()
        valid = jnp.ones((src.shape[0],), bool)
        for seed in range(4):
            rr = ransac.sim3_ransac_reproj(
                src, dst, uv_a, uv_b, s2a, s2b, pa, pb, cam, valid,
                jax.random.PRNGKey(seed), n_hyp=192, fix_scale=True,
            )
            assert float(jnp.linalg.norm(rr.t)) < 0.1, (
                seed, float(jnp.linalg.norm(rr.t)))

    def test_genuine_drift_still_detected(self):
        # a REAL 0.5 m inconsistency with matching observations must still
        # be found (the null hypothesis must not suppress true loops)
        rng = np.random.default_rng(7)
        fx = 458.0
        cam = jnp.array([fx, fx, 376.0, 240.0])
        Ra, ta = np.eye(3), np.zeros(3)
        Rb, tb = np.eye(3), np.array([0.4, 0.0, 0.0])
        X = rng.uniform([-2, -1.5, 2.5], [2, 1.5, 4.0], (80, 3))
        shift = np.array([0.5, 0.0, 0.1])
        src = X
        dst = X + shift + rng.normal(0, 0.01, X.shape)

        def proj(R, t, P):
            pc = P @ R.T + t
            return np.stack(
                [fx * pc[:, 0] / pc[:, 2] + 376.0,
                 fx * pc[:, 1] / pc[:, 2] + 240.0], -1)

        uv_a = proj(Ra, ta, src)
        uv_b = proj(Rb, tb, dst)
        s2 = jnp.ones(80)
        rr = ransac.sim3_ransac_reproj(
            jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
            jnp.asarray(uv_a, jnp.float32), jnp.asarray(uv_b, jnp.float32),
            s2, s2,
            (jnp.asarray(Ra, jnp.float32), jnp.asarray(ta, jnp.float32)),
            (jnp.asarray(Rb, jnp.float32), jnp.asarray(tb, jnp.float32)),
            cam, jnp.ones((80,), bool), jax.random.PRNGKey(0),
            n_hyp=192, fix_scale=True,
        )
        assert float(jnp.linalg.norm(np.asarray(rr.t) - shift)) < 0.1
        assert int(rr.n_inliers) > 50
