"""IMU preintegration tests against the exact analytic trajectory
(reference semantics: ImuTypes.cc:224-335, Tracking::PredictStateIMU)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io.synthetic import AnalyticTrajectory
from orb_slam3_detailed_comments_kor_tpu.ops import imu
from orb_slam3_detailed_comments_kor_tpu.utils import lie

TRAJ = AnalyticTrajectory()
G = jnp.array([0.0, 9.81, 0.0])
ZERO3 = jnp.zeros(3)


def preint_between(t0, t1, rate=200.0, max_n=256, bias_g=ZERO3, bias_a=ZERO3):
    batch = TRAJ.imu_batch(t0, t1, rate, max_n)
    return imu.integrate(batch, bias_g, bias_a, 1.7e-4, 2e-3), batch


class TestPreintegration:
    def test_predict_state_matches_gt(self):
        t0, t1 = 0.3, 0.8
        pre, _ = preint_between(t0, t1)
        R0, p0 = TRAJ.pose(t0)
        v0 = TRAJ.velocity(t0)
        R2, p2, v2 = imu.predict_state(pre, R0, p0, v0, ZERO3, ZERO3, G)
        R1, p1 = TRAJ.pose(t1)
        v1 = TRAJ.velocity(t1)
        assert np.linalg.norm(np.asarray(p2 - p1)) < 2e-3
        assert np.linalg.norm(np.asarray(v2 - v1)) < 5e-3
        rot_err = np.linalg.norm(np.asarray(lie.so3_log(R2 @ R1.T)))
        assert rot_err < 2e-3, rot_err

    def test_longer_window(self):
        pre, _ = preint_between(0.0, 2.0, max_n=512)
        R0, p0 = TRAJ.pose(0.0)
        v0 = TRAJ.velocity(0.0)
        R2, p2, v2 = imu.predict_state(pre, R0, p0, v0, ZERO3, ZERO3, G)
        R1, p1 = TRAJ.pose(2.0)
        assert np.linalg.norm(np.asarray(p2 - p1)) < 2e-2

    def test_bias_jacobian_firstorder(self):
        """Bias-corrected deltas ≈ reintegration at the new bias."""
        t0, t1 = 0.2, 0.7
        db_g = jnp.array([0.004, -0.003, 0.002])
        db_a = jnp.array([0.03, -0.02, 0.05])
        pre0, batch = preint_between(t0, t1)
        dR_c, dV_c, dP_c = imu.bias_corrected_delta(pre0, db_g, db_a)
        pre1 = imu.integrate(batch, db_g, db_a, 1.7e-4, 2e-3)
        assert np.linalg.norm(np.asarray(lie.so3_log(dR_c @ pre1.dR.T))) < 5e-5
        np.testing.assert_allclose(np.asarray(dV_c), np.asarray(pre1.dV), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dP_c), np.asarray(pre1.dP), atol=2e-4)

    def test_covariance_psd_and_grows(self):
        pre_s, _ = preint_between(0.0, 0.1)
        pre_l, _ = preint_between(0.0, 1.0)
        ev_s = np.linalg.eigvalsh(np.asarray(pre_s.cov))
        ev_l = np.linalg.eigvalsh(np.asarray(pre_l.cov))
        assert ev_s.min() > -1e-12
        assert ev_l.max() > ev_s.max()

    def test_compose_matches_single(self):
        pre_a, _ = preint_between(0.0, 0.5)
        pre_b, _ = preint_between(0.5, 1.0)
        pre_ab = imu.compose(pre_a, pre_b)
        pre_full, _ = preint_between(0.0, 1.0, max_n=512)
        assert abs(float(pre_ab.dt - pre_full.dt)) < 1e-5
        np.testing.assert_allclose(
            np.asarray(pre_ab.dP), np.asarray(pre_full.dP), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(pre_ab.dV), np.asarray(pre_full.dV), atol=2e-3
        )

    def test_invalid_samples_ignored(self):
        batch = TRAJ.imu_batch(0.0, 0.5, 200.0, 256)
        pre1 = imu.integrate(batch, ZERO3, ZERO3, 1.7e-4, 2e-3)
        # corrupt the padding region — must not change anything
        bad = batch._replace(
            acc=jnp.where(batch.valid[:, None], batch.acc, 1e6)
        )
        pre2 = imu.integrate(bad, ZERO3, ZERO3, 1.7e-4, 2e-3)
        np.testing.assert_allclose(np.asarray(pre1.dP), np.asarray(pre2.dP))

    def test_jit(self):
        batch = TRAJ.imu_batch(0.0, 0.5, 200.0, 256)
        f = jax.jit(lambda b: imu.integrate(b, ZERO3, ZERO3, 1.7e-4, 2e-3))
        pre = f(batch)
        assert np.isfinite(np.asarray(pre.cov)).all()
