"""BA engine tests on synthetic problems with exact ground truth
(validates the g2o replacement: Optimizer.cc:831 PoseOptimization,
Optimizer.cc:1637 LocalBundleAdjustment semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.optim import ba, factors
from orb_slam3_detailed_comments_kor_tpu.utils import lie

CAM = jnp.array([458.0, 457.0, 376.0, 240.0])
BF = 47.9


def make_world(key, n_points=200, n_poses=5, spread=4.0):
    kp, kx = jax.random.split(key)
    X = jax.random.uniform(
        kx, (n_points, 3), minval=jnp.array([-spread, -spread, 4.0]),
        maxval=jnp.array([spread, spread, 10.0]),
    )
    # camera path strafing along x
    ts = jnp.stack(
        [jnp.linspace(0, 1.0, n_poses), jnp.zeros(n_poses), jnp.zeros(n_poses)],
        axis=-1,
    )
    Rs = jnp.broadcast_to(jnp.eye(3), (n_poses, 3, 3))
    # world-to-camera: R_cw = R_wc^T, t_cw = -R^T t
    return Rs, -ts, X  # identity rotations: t_cw = -t_wc


def project_all(R_cw, t_cw, X, stereo=False):
    """Build a full observation table: every pose sees every point."""
    K, L = R_cw.shape[0], X.shape[0]
    kf = jnp.repeat(jnp.arange(K), L)
    lm = jnp.tile(jnp.arange(L), K)
    pc = jnp.einsum("oij,oj->oi", R_cw[kf], X[lm]) + t_cw[kf]
    pred, _ = factors.project_with_jac(CAM, pc, BF)
    uv = pred[:, :2]
    ur = pred[:, 2] if stereo else -jnp.ones((K * L,))
    in_img = (
        (uv[:, 0] > 10) & (uv[:, 0] < 742) & (uv[:, 1] > 10) & (uv[:, 1] < 470)
        & (pc[:, 2] > 0.1)
    )
    return factors.Observations(
        kf=kf.astype(jnp.int32),
        lm=lm.astype(jnp.int32),
        uv=uv,
        u_right=jnp.where(in_img, ur, -1.0) if stereo else ur,
        inv_sigma2=jnp.ones((K * L,)),
        valid=in_img,
    )


class TestPoseOptimization:
    def test_recovers_pose_with_outliers(self):
        key = jax.random.PRNGKey(3)
        R_cw, t_cw, X = make_world(key, n_points=300, n_poses=1)
        R0, t0 = R_cw[0], t_cw[0]
        pc = X @ R0.T + t0
        pred, _ = factors.project_with_jac(CAM, pc, BF)
        k1, k2, k3 = jax.random.split(key, 3)
        uv = pred[:, :2] + 0.5 * jax.random.normal(k1, (300, 2))
        ur = pred[:, 2] + 0.5 * jax.random.normal(k2, (300,))
        # 15% outliers
        out_mask = jax.random.uniform(k3, (300,)) < 0.15
        uv = jnp.where(out_mask[:, None], uv + 40.0, uv)
        # perturbed initial pose
        dR, dt = lie.se3_exp(jnp.array([0.05, -0.03, 0.02, 0.02, -0.01, 0.015]))
        R_init = dR @ R0
        t_init = dR @ t0 + dt
        res = ba.pose_optimization(
            R_init, t_init, X, uv, ur, jnp.ones((300,)),
            jnp.ones((300,), bool), CAM, BF,
        )
        rot_err = np.degrees(
            np.linalg.norm(np.asarray(lie.so3_log(res.R_cw @ R0.T)))
        )
        t_err = float(jnp.linalg.norm(res.t_cw - t0))
        assert rot_err < 0.1, rot_err
        assert t_err < 0.01, t_err
        # outliers rejected
        inl = np.asarray(res.inlier)
        assert inl[~np.asarray(out_mask)].mean() > 0.95
        assert inl[np.asarray(out_mask)].mean() < 0.05

    def test_mono_only(self):
        key = jax.random.PRNGKey(4)
        R_cw, t_cw, X = make_world(key, n_points=200, n_poses=1)
        R0, t0 = R_cw[0], t_cw[0]
        pc = X @ R0.T + t0
        pred, _ = factors.project_with_jac(CAM, pc, BF)
        uv = pred[:, :2] + 0.3 * jax.random.normal(key, (200, 2))
        ur = -jnp.ones((200,))
        dR, dt = lie.se3_exp(jnp.array([0.03, 0.02, -0.04, -0.01, 0.02, 0.0]))
        res = ba.pose_optimization(
            dR @ R0, dR @ t0 + dt, X, uv, ur, jnp.ones((200,)),
            jnp.ones((200,), bool), CAM, BF,
        )
        t_err = float(jnp.linalg.norm(res.t_cw - t0))
        assert t_err < 0.02, t_err


class TestBundleAdjust:
    def _run(self, stereo, noise=0.4):
        key = jax.random.PRNGKey(7)
        R_gt, t_gt, X_gt = make_world(key, n_points=150, n_poses=5)
        obs = project_all(R_gt, t_gt, X_gt, stereo=stereo)
        k1, k2, k3 = jax.random.split(key, 3)
        obs = obs._replace(
            uv=obs.uv + noise * jax.random.normal(k1, obs.uv.shape)
        )
        # perturb all but pose 0; perturb points
        xi = 0.02 * jax.random.normal(k2, (5, 6))
        xi = xi.at[0].set(0.0)
        dR, dt = lie.se3_exp(xi)
        R0 = dR @ R_gt
        t0 = jnp.einsum("kij,kj->ki", dR, t_gt) + dt
        X0 = X_gt + 0.05 * jax.random.normal(k3, X_gt.shape)
        fixed_pose = jnp.zeros((5,), bool).at[0].set(True)
        fixed_point = jnp.zeros((150,), bool)
        res = ba.bundle_adjust(
            R0, t0, X0, obs, fixed_pose, fixed_point, CAM, BF, iters=15
        )
        return R_gt, t_gt, X_gt, res

    def test_visual_ba_converges_mono(self):
        R_gt, t_gt, X_gt, res = self._run(stereo=False)
        t_err = np.abs(np.asarray(res.t_cw - t_gt)).max()
        # mono BA: scale is gauge-fixed only through fixed pose 0 + points
        assert t_err < 0.02, t_err
        rot_err = np.degrees(
            np.abs(np.asarray(lie.so3_log(res.R_cw @ jnp.swapaxes(R_gt, 1, 2)))).max()
        )
        assert rot_err < 0.2, rot_err

    def test_visual_ba_converges_stereo(self):
        R_gt, t_gt, X_gt, res = self._run(stereo=True)
        t_err = np.abs(np.asarray(res.t_cw - t_gt)).max()
        assert t_err < 0.01, t_err
        X_err = np.median(np.abs(np.asarray(res.X - X_gt)))
        assert X_err < 0.02, X_err

    def test_noise_floor_chi2(self):
        _, _, _, res = self._run(stereo=False, noise=0.5)
        # with sigma=0.5 px noise and inv_sigma2=1, mean chi2 ≈ 2*0.25
        chi2 = np.asarray(res.chi2)[np.asarray(res.inlier)]
        assert 0.2 < chi2.mean() < 1.5, chi2.mean()

    def test_fixed_pose_untouched(self):
        R_gt, t_gt, X_gt, res = self._run(stereo=True)
        np.testing.assert_allclose(
            np.asarray(res.t_cw[0]), np.asarray(t_gt[0]), atol=1e-6
        )


class TestGaugeAndMasks:
    def test_invalid_obs_ignored(self):
        key = jax.random.PRNGKey(9)
        R_gt, t_gt, X_gt = make_world(key, n_points=80, n_poses=3)
        obs = project_all(R_gt, t_gt, X_gt, stereo=True)
        # corrupt half the observations but mark them invalid
        n = obs.uv.shape[0]
        bad = jnp.arange(n) % 2 == 0
        obs = obs._replace(
            uv=jnp.where(bad[:, None], obs.uv + 500.0, obs.uv),
            valid=obs.valid & ~bad,
        )
        fixed_pose = jnp.zeros((3,), bool).at[0].set(True)
        res = ba.bundle_adjust(
            R_gt, t_gt, X_gt, obs, fixed_pose, jnp.zeros((80,), bool),
            CAM, BF, iters=5,
        )
        # starting at GT with valid-only noise-free obs: must stay at GT
        assert float(jnp.abs(res.t_cw - t_gt).max()) < 1e-4
        assert float(jnp.abs(res.X - X_gt).max()) < 1e-3


class TestBundleAdjustCG:
    """Matrix-free PCG Schur BA must match the dense path and scale to
    GBA-sized problems (g2o BlockSolver+PCG analog)."""

    def _problem(self, n_points=150, n_poses=5, stereo=True, seed=7):
        key = jax.random.PRNGKey(seed)
        R_gt, t_gt, X_gt = make_world(key, n_points=n_points, n_poses=n_poses)
        obs = project_all(R_gt, t_gt, X_gt, stereo=stereo)
        k1, k2, k3 = jax.random.split(key, 3)
        obs = obs._replace(
            uv=obs.uv + 0.4 * jax.random.normal(k1, obs.uv.shape)
        )
        xi = 0.02 * jax.random.normal(k2, (n_poses, 6))
        xi = xi.at[0].set(0.0)
        dR, dt = lie.se3_exp(xi)
        R0 = dR @ R_gt
        t0 = jnp.einsum("kij,kj->ki", dR, t_gt) + dt
        X0 = X_gt + 0.05 * jax.random.normal(k3, X_gt.shape)
        fixed_pose = jnp.zeros((n_poses,), bool).at[0].set(True)
        fixed_point = jnp.zeros((n_points,), bool)
        return R_gt, t_gt, X_gt, obs, R0, t0, X0, fixed_pose, fixed_point

    def test_matches_dense_schur(self):
        (R_gt, t_gt, X_gt, obs, R0, t0, X0, fixed_pose,
         fixed_point) = self._problem()
        res = ba.bundle_adjust_cg(
            R0, t0, X0, obs, fixed_pose, fixed_point, CAM, BF, iters=15,
            cg_iters=30,
        )
        t_err = np.abs(np.asarray(res.t_cw - t_gt)).max()
        assert t_err < 0.01, t_err
        rot_err = np.degrees(np.abs(np.asarray(
            lie.so3_log(res.R_cw @ jnp.swapaxes(R_gt, 1, 2)))).max())
        assert rot_err < 0.2, rot_err
        X_err = np.median(np.abs(np.asarray(res.X - X_gt)))
        assert X_err < 0.02, X_err

    def test_fixed_pose_untouched_cg(self):
        (_, t_gt, _, obs, R0, t0, X0, fixed_pose,
         fixed_point) = self._problem()
        res = ba.bundle_adjust_cg(
            R0, t0, X0, obs, fixed_pose, fixed_point, CAM, BF, iters=8
        )
        np.testing.assert_allclose(
            np.asarray(res.t_cw[0]), np.asarray(t_gt[0]), atol=1e-6
        )

    def test_gba_scale_memory(self):
        """K=64 poses x L=8192 points: the dense path would need a
        [64,6,8192,3] coupling per einsum operand; CG must run it."""
        (R_gt, t_gt, X_gt, obs, R0, t0, X0, fixed_pose,
         fixed_point) = self._problem(n_points=8192, n_poses=64, seed=11)
        res = ba.bundle_adjust_cg(
            R0, t0, X0, obs, fixed_pose, fixed_point, CAM, BF, iters=6,
            cg_iters=20,
        )
        t_err = np.abs(np.asarray(res.t_cw - t_gt)).max()
        assert t_err < 0.05, t_err
