"""ORB front-end tests: extraction, matching, stereo depth — all on a
synthetic textured wall with exact ground truth (reference has no tests;
strategy per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.models import camera as cam
from orb_slam3_detailed_comments_kor_tpu.ops import matching, orb, pyramid, stereo

H, W = 240, 376  # half-res for test speed
PARAMS = jnp.array([230.0, 230.0, W / 2.0, H / 2.0])
SCENE = synthetic.default_scene()


@pytest.fixture(scope="module")
def img0():
    img, _ = synthetic.render(PARAMS, jnp.eye(3), jnp.zeros(3), SCENE, h=H, w=W)
    return img


@pytest.fixture(scope="module")
def feats0(img0):
    return orb.extract_orb(img0, n_features=600, cell=24)


class TestExtraction:
    def test_enough_keypoints(self, feats0):
        assert int(feats0.valid.sum()) > 300

    def test_coords_in_bounds(self, feats0):
        xy = np.asarray(feats0.xy)[np.asarray(feats0.valid)]
        assert xy[:, 0].min() >= 0 and xy[:, 0].max() < W
        assert xy[:, 1].min() >= 0 and xy[:, 1].max() < H

    def test_levels_populated(self, feats0):
        levels = np.asarray(feats0.level)[np.asarray(feats0.valid)]
        assert len(np.unique(levels)) >= 4  # multi-scale coverage

    def test_deterministic(self, img0, feats0):
        f2 = orb.extract_orb(img0, n_features=600, cell=24)
        np.testing.assert_array_equal(np.asarray(feats0.desc), np.asarray(f2.desc))
        np.testing.assert_array_equal(np.asarray(feats0.xy), np.asarray(f2.xy))

    def test_descriptor_bits_nondegenerate(self, feats0):
        d = np.asarray(feats0.desc)[np.asarray(feats0.valid)]
        means = d.mean(axis=0)
        # bits should be informative, not stuck at 0/1
        assert 0.1 < means.mean() < 0.9
        assert (d.sum(axis=1) > 20).all()  # no empty descriptors

    def test_pack_unpack_roundtrip(self, feats0):
        packed = orb.pack_descriptors(feats0.desc)
        unpacked = orb.unpack_descriptors(packed)
        np.testing.assert_array_equal(np.asarray(feats0.desc), np.asarray(unpacked))


class TestMatching:
    def test_hamming_matrix_exact(self):
        rng = np.random.RandomState(0)
        a = rng.randint(0, 2, (64, 256)).astype(np.uint8)
        b = rng.randint(0, 2, (48, 256)).astype(np.uint8)
        d = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = (a[:, None, :] != b[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d.astype(np.int32), ref)

    def test_translated_image_matches(self, img0, feats0):
        # camera translated slightly -> features shift by ~fx*dx/z
        dx = 0.05
        img1, _ = synthetic.render(
            PARAMS, jnp.eye(3), jnp.array([dx, 0.0, 0.0]), SCENE, h=H, w=W
        )
        f1 = orb.extract_orb(img1, n_features=600, cell=24)
        res = matching.match_nn_ratio(
            feats0.desc, f1.desc, feats0.valid, f1.valid, max_dist=60
        )
        n_matches = int(res.valid.sum())
        assert n_matches > 80
        # expected pixel shift: points at z=5, du = -fx*dx/z
        du_expected = -float(PARAMS[0]) * dx / 5.0
        du = np.asarray(f1.xy[res.idx, 0] - feats0.xy[:, 0])[np.asarray(res.valid)]
        # majority of matches should see the right displacement
        frac_good = np.mean(np.abs(du - du_expected) < 2.0)
        assert frac_good > 0.7, (frac_good, du_expected, np.median(du))

    def test_rotation_consistency(self, feats0):
        # matching a set against itself: angle diffs ~0 -> all in top bins
        res = matching.match_nn_ratio(
            feats0.desc, feats0.desc, feats0.valid, feats0.valid, max_dist=10
        )
        refined = matching.rotation_consistency_mask(
            feats0.angle, feats0.angle, res.idx, res.valid
        )
        assert int(refined.sum()) >= int(res.valid.sum()) * 0.95

    def test_self_match_identity(self, feats0):
        res = matching.match_nn_ratio(
            feats0.desc, feats0.desc, feats0.valid, feats0.valid,
            max_dist=5, ratio=1.0,
        )
        idx = np.asarray(res.idx)
        valid = np.asarray(res.valid)
        assert (idx[valid] == np.arange(len(idx))[valid]).mean() > 0.9


class TestStereo:
    def test_depth_recovery(self):
        baseline = 0.2
        bf = baseline * float(PARAMS[0])
        imgL, imgR, depthL = synthetic.stereo_pair(
            PARAMS, jnp.eye(3), jnp.zeros(3), baseline, SCENE, h=H, w=W
        )
        fl = orb.extract_orb(imgL, n_features=600, cell=24)
        fr = orb.extract_orb(imgR, n_features=600, cell=24)
        pyr_l = pyramid.build_pyramid(imgL, 8, 1.2)
        pyr_r = pyramid.build_pyramid(imgR, 8, 1.2)
        sd = stereo.compute_stereo_matches(fl, fr, pyr_l, pyr_r, bf)
        n_valid = int(sd.valid.sum())
        assert n_valid > 100, n_valid
        # ground-truth depth at the keypoint pixels
        xy = np.asarray(fl.xy)
        gt = np.asarray(depthL)[
            np.clip(xy[:, 1].round().astype(int), 0, H - 1),
            np.clip(xy[:, 0].round().astype(int), 0, W - 1),
        ]
        est = np.asarray(sd.depth)
        v = np.asarray(sd.valid) & (gt > 0)
        rel_err = np.abs(est[v] - gt[v]) / gt[v]
        assert np.median(rel_err) < 0.035, np.median(rel_err)
        # majority of depths within 10%
        assert (rel_err < 0.1).mean() > 0.8
