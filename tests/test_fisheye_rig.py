"""Rig right-camera observations (dual-fisheye ToBody edges).

The reference keeps right-camera reprojection constraints alive through
dedicated edge types (``include/OptimizableTypes.h:31-145``,
``EdgeSE3ProjectXYZToBody`` / ``...OnlyPoseToBody``); here each matched
right-view pixel becomes an independent mono observation row (cam=1)
projected through the rig extrinsic. These tests assert the rows are
ACTIVE — populated by the front-end, stored in the map, constraining in
pose optimization — not silently masked out.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.models import camera
from orb_slam3_detailed_comments_kor_tpu.optim import ba, factors
from orb_slam3_detailed_comments_kor_tpu.slam import frontend
from orb_slam3_detailed_comments_kor_tpu.utils import lie

from tests.test_fisheye import (  # noqa: F401
    FX, H, KB8_DIST, W, fisheye_config,
)
from tests.test_fisheye import TestStereoFisheye as _StereoFisheye

BASE = 0.10
PARAMS = jnp.array([FX, FX, W / 2.0, H / 2.0, *KB8_DIST])
R_RL = jnp.eye(3)
T_RL = jnp.array([-BASE, 0.0, 0.0])  # left→right
RIG = (R_RL, T_RL, PARAMS)


def _stereo_frame():
    scene = synthetic.default_scene()
    img_l, _ = synthetic.render(
        PARAMS, jnp.eye(3), jnp.zeros(3), scene, h=H, w=W,
        model="kannala_brandt8",
    )
    img_r, _ = synthetic.render(
        PARAMS, jnp.eye(3), jnp.array([BASE, 0.0, 0.0]), scene,
        h=H, w=W, model="kannala_brandt8",
    )
    return frontend.process_stereo_fisheye(
        img_l, img_r, PARAMS, PARAMS, R_RL, T_RL,
        n_features=500, n_levels=8, scale=1.2, cell=20,
    )


class TestRightRowsActive:
    def test_frontend_populates_uv_r(self):
        fr = _stereo_frame()
        has_r = np.asarray(fr.uv_r[:, 0] >= 0) & np.asarray(fr.valid)
        assert has_r.sum() > 100, has_r.sum()
        # uv_r must be consistent with projecting the triangulated point
        # into the right camera (identity world pose here)
        rays = camera.kb8_unproject(PARAMS, fr.xy)
        X = rays * fr.depth[:, None]
        uv_r_pred = camera.kb8_project(PARAMS, X @ R_RL.T + T_RL)
        err = np.linalg.norm(
            np.asarray(uv_r_pred - fr.uv_r), axis=-1
        )[has_r & np.asarray(fr.depth > 0)]
        assert np.median(err) < 3.0, np.median(err)

    def test_right_residuals_constrain(self):
        """cam=1 rows: ~0 at the true pose, non-zero at a wrong pose."""
        rng = np.random.default_rng(0)
        n = 64
        X = jnp.asarray(
            rng.uniform([-1.5, -1.5, 2.0], [1.5, 1.5, 5.0], (n, 3)),
            jnp.float32,
        )
        R_gt = lie.so3_exp(jnp.array([0.03, -0.05, 0.02]))
        t_gt = jnp.array([0.1, -0.2, 0.3])
        uv_l = camera.kb8_project(PARAMS, X @ R_gt.T + t_gt)
        uv_r = camera.kb8_project(
            PARAMS, (X @ R_gt.T + t_gt) @ R_RL.T + T_RL
        )
        obs = factors.Observations(
            kf=jnp.zeros((n,), jnp.int32),
            lm=jnp.arange(n, dtype=jnp.int32),
            uv=uv_l,
            u_right=-jnp.ones((n,)),
            inv_sigma2=jnp.ones((n,)),
            valid=jnp.ones((n,), bool),
        )
        obs = factors.with_rig_rows(obs, uv_r)
        r_true, _, _ = factors.reproj_residuals(
            R_gt[None], t_gt[None], X, obs, PARAMS, 0.0,
            "kannala_brandt8", rig=RIG,
        )
        right = np.asarray(obs.cam) == 1
        assert np.abs(np.asarray(r_true))[right].max() < 1e-2
        r_off, _, _ = factors.reproj_residuals(
            R_gt[None], (t_gt + jnp.array([0.05, 0, 0]))[None], X, obs,
            PARAMS, 0.0, "kannala_brandt8", rig=RIG,
        )
        px_off = np.linalg.norm(np.asarray(r_off)[:, :2], axis=-1)[right]
        assert np.median(px_off) > 0.5, np.median(px_off)

    def test_pose_opt_with_rig_converges(self):
        rng = np.random.default_rng(1)
        n = 96
        X = jnp.asarray(
            rng.uniform([-1.5, -1.5, 2.0], [1.5, 1.5, 5.0], (n, 3)),
            jnp.float32,
        )
        R_gt = lie.so3_exp(jnp.array([0.02, 0.04, -0.03]))
        t_gt = jnp.array([-0.1, 0.15, 0.2])
        uv_l = camera.kb8_project(PARAMS, X @ R_gt.T + t_gt)
        uv_r = camera.kb8_project(
            PARAMS, (X @ R_gt.T + t_gt) @ R_RL.T + T_RL
        )
        R0 = lie.so3_exp(jnp.array([0.05, -0.03, 0.04])) @ R_gt
        t0 = t_gt + jnp.array([0.15, -0.1, 0.1])
        res = ba.pose_optimization(
            R0, t0, X, uv_l, -jnp.ones((n,)), jnp.ones((n,)),
            jnp.ones((n,), bool), PARAMS, 0.0,
            cam_model="kannala_brandt8", uv_r=uv_r, rig=RIG,
        )
        assert float(jnp.linalg.norm(res.t_cw - t_gt)) < 1e-3
        assert float(
            jnp.linalg.norm(lie.so3_log(res.R_cw @ R_gt.T))
        ) < 1e-3
        # left-row inlier semantics preserved
        assert res.inlier.shape == (n,)
        assert int(res.n_inliers) > 80

    def test_right_rows_rescue_degenerate_left(self):
        """With most LEFT rows invalid, the rig rows must still anchor the
        solve — proof they contribute to the normal equations."""
        rng = np.random.default_rng(2)
        n = 96
        X = jnp.asarray(
            rng.uniform([-1.5, -1.5, 2.0], [1.5, 1.5, 5.0], (n, 3)),
            jnp.float32,
        )
        R_gt = jnp.eye(3)
        t_gt = jnp.zeros(3)
        uv_l = camera.kb8_project(PARAMS, X)
        uv_r = camera.kb8_project(PARAMS, X @ R_RL.T + T_RL)
        valid_l = jnp.arange(n) < 8  # only 8 left rows survive
        R0 = lie.so3_exp(jnp.array([0.03, 0.02, -0.02]))
        t0 = jnp.array([0.08, -0.06, 0.05])
        res_no = ba.pose_optimization(
            R0, t0, X, uv_l, -jnp.ones((n,)), jnp.ones((n,)), valid_l,
            PARAMS, 0.0, cam_model="kannala_brandt8",
        )
        res_rig = ba.pose_optimization(
            R0, t0, X, uv_l, -jnp.ones((n,)), jnp.ones((n,)), valid_l,
            PARAMS, 0.0, cam_model="kannala_brandt8", uv_r=uv_r, rig=RIG,
        )
        err_no = float(jnp.linalg.norm(res_no.t_cw - t_gt))
        err_rig = float(jnp.linalg.norm(res_rig.t_cw - t_gt))
        assert err_rig < 5e-3
        assert err_rig <= err_no + 1e-6


class TestRigInMap:
    def test_kf_uvr_stored_and_e2e(self):
        slam, ts = _StereoFisheye()._run(n=40)
        assert slam.state == 1  # OK
        uvr = np.asarray(slam.ms.kf_uvr[: slam.n_kf])
        feat_ok = np.asarray(slam.ms.kf_feat_valid[: slam.n_kf])
        n_right = ((uvr[..., 0] >= 0) & feat_ok).sum()
        assert n_right > 200, n_right
        _, centers, _ = slam.trajectory_arrays()
        from orb_slam3_detailed_comments_kor_tpu.eval import ate

        rmse = ate.ate_rmse(centers, ts[: len(centers)])
        assert rmse < 0.05, f"metric ATE {rmse*1000:.1f}mm"


class TestKB8LoopGate:
    def test_sim3_ransac_reproj_kb8(self):
        """Loop verification's Sim3 RANSAC with the KB8 pixel gate must
        recover a known SE3 drift from fisheye observations (replaces the
        scale-dependent 0.12 m metric gate, Sim3Solver::CheckInliers)."""
        import jax

        from orb_slam3_detailed_comments_kor_tpu.ops import ransac

        rng = np.random.default_rng(3)
        m = 128
        X_true = jnp.asarray(
            rng.uniform([-2, -2, 2.5], [2, 2, 6.0], (m, 3)), jnp.float32
        )
        # drift warp: correct ≈ R_d @ drifted + t_d  (dst = warp(src))
        R_d = lie.so3_exp(jnp.array([0.0, 0.04, 0.0]))
        t_d = jnp.array([0.3, -0.1, 0.05])
        X_drift = (X_true - t_d) @ R_d  # src: current drifted map points
        # keyframe a observes the drifted points, keyframe b the true ones
        Ra, ta = jnp.eye(3), jnp.array([0.0, 0.0, 0.5])
        Rb, tb = lie.so3_exp(jnp.array([0.02, -0.01, 0.0])), jnp.zeros(3)
        uv_a = camera.kb8_project(PARAMS, X_drift @ Ra.T + ta)
        uv_b = camera.kb8_project(PARAMS, X_true @ Rb.T + tb)
        # 20% outlier correspondences
        out = jnp.asarray(rng.random(m) < 0.2)
        uv_b = jnp.where(
            out[:, None], uv_b + jnp.asarray(rng.normal(0, 40, (m, 2)),
                                             jnp.float32), uv_b
        )
        s2 = jnp.ones((m,))
        rr = ransac.sim3_ransac_reproj(
            X_drift, X_true, uv_a, uv_b, s2, s2, (Ra, ta), (Rb, tb),
            PARAMS, jnp.ones((m,), bool), jax.random.PRNGKey(0),
            n_hyp=192, fix_scale=True, cam_model="kannala_brandt8",
        )
        assert int(rr.n_inliers) > 0.6 * m, int(rr.n_inliers)
        assert float(jnp.linalg.norm(rr.t - t_d)) < 0.02
        assert float(jnp.linalg.norm(lie.so3_log(rr.R @ R_d.T))) < 0.01
