"""Distributed BA on the 8-virtual-device CPU mesh: must match the
single-device solver (the 'fake backend' test the reference never had,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.optim import ba
from orb_slam3_detailed_comments_kor_tpu.parallel import dist_ba
from orb_slam3_detailed_comments_kor_tpu.utils import lie

from test_ba import CAM, BF, make_world, project_all


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
class TestDistributedBA:
    def test_matches_single_device(self):
        key = jax.random.PRNGKey(11)
        R_gt, t_gt, X_gt = make_world(key, n_points=120, n_poses=4)
        obs = project_all(R_gt, t_gt, X_gt, stereo=True)
        k1, k2, k3 = jax.random.split(key, 3)
        obs = obs._replace(uv=obs.uv + 0.3 * jax.random.normal(k1, obs.uv.shape))
        xi = 0.02 * jax.random.normal(k2, (4, 6)).at[0].set(0.0)
        dR, dt = lie.se3_exp(xi)
        R0 = dR @ R_gt
        t0 = jnp.einsum("kij,kj->ki", dR, t_gt) + dt
        X0 = X_gt + 0.05 * jax.random.normal(k3, X_gt.shape)
        fixed_pose = jnp.zeros((4,), bool).at[0].set(True)
        fixed_point = jnp.zeros((120,), bool)

        mesh = dist_ba.make_mesh(8)
        Rd, td, Xd = dist_ba.distributed_bundle_adjust(
            mesh, R0, t0, X0, obs, fixed_pose, fixed_point, CAM, BF, iters=10
        )
        # recovers ground truth
        t_err = np.abs(np.asarray(td - t_gt)).max()
        assert t_err < 0.01, t_err
        # agrees with the single-device path
        res = ba.bundle_adjust(
            R0, t0, X0, obs, fixed_pose, fixed_point, CAM, BF, iters=10
        )
        np.testing.assert_allclose(
            np.asarray(td), np.asarray(res.t_cw), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(Xd), np.asarray(res.X), atol=5e-3
        )

    def test_obs_padding(self):
        key = jax.random.PRNGKey(12)
        R_gt, t_gt, X_gt = make_world(key, n_points=33, n_poses=2)  # odd sizes
        obs = project_all(R_gt, t_gt, X_gt, stereo=False)
        mesh = dist_ba.make_mesh(8)
        Rd, td, Xd = dist_ba.distributed_bundle_adjust(
            mesh, R_gt, t_gt, X_gt, obs,
            jnp.zeros((2,), bool).at[0].set(True), jnp.zeros((33,), bool),
            CAM, BF, iters=3,
        )
        # noise-free from GT: stays at GT
        assert float(jnp.abs(td - t_gt).max()) < 1e-4

    def test_cg_matches_single_device(self):
        """Obs-sharded matrix-free PCG Schur must agree with the
        single-device CG solver and recover ground truth."""
        key = jax.random.PRNGKey(13)
        R_gt, t_gt, X_gt = make_world(key, n_points=150, n_poses=5)
        obs = project_all(R_gt, t_gt, X_gt, stereo=True)
        k1, k2, k3 = jax.random.split(key, 3)
        obs = obs._replace(uv=obs.uv + 0.3 * jax.random.normal(k1, obs.uv.shape))
        xi = 0.02 * jax.random.normal(k2, (5, 6)).at[0].set(0.0)
        dR, dt = lie.se3_exp(xi)
        R0 = dR @ R_gt
        t0 = jnp.einsum("kij,kj->ki", dR, t_gt) + dt
        X0 = X_gt + 0.05 * jax.random.normal(k3, X_gt.shape)
        fixed_pose = jnp.zeros((5,), bool).at[0].set(True)
        fixed_point = jnp.zeros((150,), bool)

        mesh = dist_ba.make_mesh(8)
        Rd, td, Xd = dist_ba.distributed_bundle_adjust_cg(
            mesh, R0, t0, X0, obs, fixed_pose, fixed_point, CAM, BF,
            iters=10, cg_iters=30,
        )
        t_err = np.abs(np.asarray(td - t_gt)).max()
        assert t_err < 0.01, t_err
        res = ba.bundle_adjust_cg(
            R0, t0, X0, obs, fixed_pose, fixed_point, CAM, BF, iters=10,
            cg_iters=30,
        )
        np.testing.assert_allclose(
            np.asarray(td), np.asarray(res.t_cw), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(Xd), np.asarray(res.X), atol=5e-3
        )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_distributed_vi_ba_matches_single_device():
    """Obs-sharded whole-map VI GBA (FullInertialBA at pod scale,
    ``Optimizer.cc:397`` / ``LoopClosing.cc:2287-2289``) must match the
    single-device matrix-free solver on the same problem."""
    from orb_slam3_detailed_comments_kor_tpu.optim import vi_ba
    from orb_slam3_detailed_comments_kor_tpu.parallel import dist_vi_ba
    from test_vi_ba import BF as VBF, CAM as VCAM, G, build_vi_problem

    st_gt, X_gt, obs, edges = build_vi_problem(n_kf=6)
    key = jax.random.PRNGKey(21)
    k1, k2, k3 = jax.random.split(key, 3)
    xi = 0.01 * jax.random.normal(k1, (6, 6)).at[0].set(0.0)
    dR, dt = lie.se3_exp(xi)
    st0 = st_gt._replace(
        R_bw=dR @ st_gt.R_bw,
        t_bw=jnp.einsum("kij,kj->ki", dR, st_gt.t_bw) + dt,
        v=st_gt.v + 0.05 * jax.random.normal(k2, st_gt.v.shape),
    )
    X0 = X_gt + 0.02 * jax.random.normal(k3, X_gt.shape)
    fixed_kf = jnp.zeros((6,), bool).at[0].set(True)
    fixed_point = jnp.zeros((X_gt.shape[0],), bool)

    mesh = dist_ba.make_mesh(8)
    st_d, X_d = dist_vi_ba.distributed_vi_ba_cg(
        mesh, st0, X0, obs, edges, fixed_kf, fixed_point, VCAM,
        jnp.eye(3), jnp.zeros(3), VBF, G,
        gyro_walk_info=vi_ba.WALK_INFO_CAP,
        acc_walk_info=vi_ba.WALK_INFO_CAP, iters=8,
    )
    st_s, X_s, _ = vi_ba.vi_bundle_adjust_cg(
        st0, X0, obs, edges, fixed_kf, fixed_point, VCAM,
        jnp.eye(3), jnp.zeros(3), VBF, G,
        gyro_walk_info=vi_ba.WALK_INFO_CAP,
        acc_walk_info=vi_ba.WALK_INFO_CAP, iters=8,
    )
    # recovers ground truth and agrees with the single-device solve
    assert float(jnp.abs(st_d.t_bw - st_gt.t_bw).max()) < 0.05
    np.testing.assert_allclose(
        np.asarray(st_d.t_bw), np.asarray(st_s.t_bw), atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(st_d.v), np.asarray(st_s.v), atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(X_d), np.asarray(X_s), atol=5e-3)
