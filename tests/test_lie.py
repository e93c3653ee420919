"""Property tests for SO3/SE3/Sim3 (reference semantics: ImuTypes.h:270-279,
g2o se3quat/sim3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.utils import lie

KEY = jax.random.PRNGKey(0)


def rand_w(key, n=64, scale=1.0):
    return jax.random.normal(key, (n, 3)) * scale


class TestSO3:
    def test_exp_is_rotation(self):
        w = rand_w(KEY)
        R = lie.so3_exp(w)
        eye = jnp.eye(3)
        err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye).max()
        assert err < 1e-5
        assert jnp.abs(jnp.linalg.det(R) - 1).max() < 1e-5

    def test_exp_log_roundtrip(self):
        # log∘exp is identity only inside the injectivity radius |w|<π
        w = rand_w(KEY, scale=1.5)
        norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        w = w / norm * jnp.minimum(norm, 0.95 * jnp.pi)
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w, w2, atol=1e-4)

    def test_log_exp_small_angle(self):
        w = rand_w(KEY, scale=1e-6)
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w, w2, atol=1e-9)

    def test_log_near_pi(self):
        axis = jnp.array([[0.3, -0.5, 0.81]])
        axis = axis / jnp.linalg.norm(axis)
        w = axis * 3.1200
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-3)

    def test_right_jacobian_fd(self):
        """J_r: exp(w + dw) ≈ exp(w) exp(J_r(w) dw)."""
        w = jnp.array([0.2, -0.4, 0.7])
        Jr = lie.so3_right_jacobian(w)
        dw = jnp.array([1e-4, -2e-4, 3e-4])
        lhs = lie.so3_exp(w + dw)
        rhs = lie.so3_exp(w) @ lie.so3_exp(Jr @ dw)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)

    def test_right_jacobian_inv(self):
        w = rand_w(KEY, n=16)
        J = lie.so3_right_jacobian(w)
        Ji = lie.so3_right_jacobian_inv(w)
        eye = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(np.asarray(J @ Ji), np.asarray(eye), atol=1e-5)

    def test_project_to_so3(self):
        R = lie.so3_exp(rand_w(KEY, n=8))
        noisy = R + 0.01 * jax.random.normal(KEY, R.shape)
        P = lie.project_to_so3(noisy)
        eye = jnp.eye(3)
        assert jnp.abs(P @ jnp.swapaxes(P, -1, -2) - eye).max() < 1e-5


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (32, 6)) * 0.8
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)

    def test_compose_inverse(self):
        xi = jax.random.normal(KEY, (8, 6))
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(
            np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)

    def test_action(self):
        xi = jax.random.normal(KEY, (6,))
        R, t = lie.se3_exp(xi)
        x = jax.random.normal(KEY, (10, 3))
        y = lie.se3_apply(R, t, x)
        x2 = lie.se3_apply(*lie.se3_inverse(R, t), y)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (16, 7)) * 0.7
        R, t, s = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(R, t, s)
        # f32 exp->log through two trig branches: ~2e-4 noise is expected
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=5e-4)

    def test_sigma_zero_matches_se3(self):
        xi6 = jax.random.normal(KEY, (8, 6))
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
        R7, t7, s7 = lie.sim3_exp(xi7)
        R6, t6 = lie.se3_exp(xi6)
        np.testing.assert_allclose(np.asarray(R7), np.asarray(R6), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t7), np.asarray(t6), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s7), 1.0, atol=1e-6)

    def test_compose_inverse(self):
        xi = jax.random.normal(KEY, (8, 7)) * 0.5
        R, t, s = lie.sim3_exp(xi)
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        Rc, tc, sc = lie.sim3_compose(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(
            np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)

    def test_action_scale(self):
        R = jnp.eye(3)
        t = jnp.zeros(3)
        s = jnp.array(2.0)
        x = jnp.array([1.0, 2.0, 3.0])
        y = lie.sim3_apply(R, t, s, x)
        np.testing.assert_allclose(np.asarray(y), [2.0, 4.0, 6.0])


class TestQuat:
    def test_roundtrip(self):
        w = rand_w(KEY, n=32, scale=2.0)
        R = lie.so3_exp(w)
        q = lie.rotmat_to_quat(R)
        R2 = lie.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


class TestJit:
    def test_all_jittable(self):
        xi = jax.random.normal(KEY, (4, 6)) * 0.5
        f = jax.jit(lambda x: lie.se3_log(*lie.se3_exp(x)))
        np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-4)
