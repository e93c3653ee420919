"""Visual-inertial BA tests on the analytic trajectory: joint recovery of
poses, velocities and IMU biases (LocalInertialBA semantics,
Optimizer.cc:3959)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io.synthetic import AnalyticTrajectory
from orb_slam3_detailed_comments_kor_tpu.ops import imu
from orb_slam3_detailed_comments_kor_tpu.optim import factors, vi_ba
from orb_slam3_detailed_comments_kor_tpu.utils import lie

CAM = jnp.array([230.0, 230.0, 188.0, 120.0])
BF = 25.3
G = jnp.array([0.0, 9.81, 0.0])
TRAJ = AnalyticTrajectory()
SIGMA_G, SIGMA_A = 1.7e-4, 2.0e-3


def build_vi_problem(n_kf=6, dt_kf=0.25, bias_g=None, bias_a=None, key=None):
    """KFs on the analytic trajectory + landmarks + stereo obs + edges."""
    key = key if key is not None else jax.random.PRNGKey(5)
    bias_g = jnp.zeros(3) if bias_g is None else bias_g
    bias_a = jnp.zeros(3) if bias_a is None else bias_a
    times = [0.5 + i * dt_kf for i in range(n_kf)]
    R_wb = jnp.stack([TRAJ.pose(t)[0] for t in times])
    p_wb = jnp.stack([TRAJ.pose(t)[1] for t in times])
    v = jnp.stack([TRAJ.velocity(t) for t in times])
    # body == camera (T_cb = I) for the test
    R_bw = jnp.swapaxes(R_wb, 1, 2)
    t_bw = -jnp.einsum("kij,kj->ki", R_bw, p_wb)

    L = 150
    X = jax.random.uniform(
        key, (L, 3), minval=jnp.array([-2.0, -1.2, 2.0]),
        maxval=jnp.array([2.0, 1.2, 5.0]),
    )
    kf = jnp.repeat(jnp.arange(n_kf), L).astype(jnp.int32)
    lm = jnp.tile(jnp.arange(L), n_kf).astype(jnp.int32)
    pc = jnp.einsum("oij,oj->oi", R_bw[kf], X[lm]) + t_bw[kf]
    pred, _ = factors.project_with_jac(CAM, pc, BF)
    in_img = (
        (pred[:, 0] > 5) & (pred[:, 0] < 371) & (pred[:, 1] > 5)
        & (pred[:, 1] < 235) & (pc[:, 2] > 0.3)
    )
    obs = factors.Observations(
        kf=kf, lm=lm, uv=pred[:, :2], u_right=jnp.where(in_img, pred[:, 2], -1.0),
        inv_sigma2=jnp.ones((n_kf * L,)), valid=in_img,
    )

    # preintegrated edges with measured bias injected. 1 kHz sampling keeps
    # the Euler discretization error below the modeled noise floor (at low
    # rates the noise-free synthetic IMU's information matrix would be
    # dishonestly high and the discretization bias would dominate the BA).
    pres = []
    for a, b in zip(times[:-1], times[1:]):
        batch = TRAJ.imu_batch(a, b, 1000.0, 512)
        batch = batch._replace(
            acc=batch.acc + bias_a, gyro=batch.gyro + bias_g
        )
        pres.append(imu.integrate(batch, jnp.zeros(3), jnp.zeros(3),
                                  SIGMA_G, SIGMA_A))
    E = n_kf - 1
    edges = vi_ba.make_edges(
        pres, jnp.arange(E), jnp.arange(1, E + 1)
    )
    st = vi_ba.VIState(R_bw=R_bw, t_bw=t_bw, v=v,
                       bg=jnp.zeros((n_kf, 3)), ba=jnp.zeros((n_kf, 3)))
    return st, X, obs, edges


def run_vi(st0, X0, obs, edges, n_kf, iters=12):
    fixed_kf = jnp.zeros((n_kf,), bool).at[0].set(True)
    fixed_point = jnp.zeros((X0.shape[0],), bool)
    st_f, X_f, _ = vi_ba.vi_bundle_adjust(
        st0, X0, obs, edges, fixed_kf, fixed_point, CAM,
        jnp.eye(3), jnp.zeros(3), BF, G,
        gyro_walk_info=vi_ba.WALK_INFO_CAP, acc_walk_info=vi_ba.WALK_INFO_CAP,
        iters=iters,
    )
    return st_f, X_f


class TestVIBA:
    def test_residual_zero_at_gt(self):
        st, X, obs, edges = build_vi_problem()
        r, _ = vi_ba.eval_inertial(st, edges, G)
        assert np.abs(np.asarray(r)).max() < 5e-3, np.abs(np.asarray(r)).max()

    def test_recovers_from_perturbation(self):
        st, X, obs, edges = build_vi_problem()
        key = jax.random.PRNGKey(8)
        xi = 0.02 * jax.random.normal(key, (6, 6)).at[0].set(0.0)
        dR, dt = lie.se3_exp(xi)
        # KF0 is the fixed gauge anchor (pose+vel+bias, like the reference's
        # setFixed vertices) — only perturb the free keyframes
        dv = 0.05 * jax.random.normal(key, st.v.shape).at[0].set(0.0)
        st0 = st._replace(
            R_bw=dR @ st.R_bw,
            t_bw=jnp.einsum("kij,kj->ki", dR, st.t_bw) + dt,
            v=st.v + dv,
        )
        X0 = X + 0.03 * jax.random.normal(key, X.shape)
        st_f, X_f = run_vi(st0, X0, obs, edges, 6)
        # compare body positions
        p_f = -jnp.einsum("kji,kj->ki", st_f.R_bw, st_f.t_bw)
        p_g = -jnp.einsum("kji,kj->ki", st.R_bw, st.t_bw)
        assert np.abs(np.asarray(p_f - p_g)).max() < 0.01
        assert np.abs(np.asarray(st_f.v - st.v)).max() < 0.05

    def test_vi_init_estimates_bias_gravity_velocity(self):
        """IMU initialization (InertialOptimization analog): shared bias +
        gravity direction + velocities with poses fixed."""
        from orb_slam3_detailed_comments_kor_tpu.optim import vi_init

        bg = jnp.array([0.02, -0.015, 0.01])
        ba_true = jnp.array([0.15, -0.1, 0.2])
        st, X, obs, edges = build_vi_problem(bias_g=bg, bias_a=ba_true, n_kf=10)
        # gravity guess 15 degrees off
        g_guess = lie.so3_exp(jnp.array([0.26, 0.0, 0.05])) @ G
        # weak priors here: this test deliberately injects large true
        # biases to verify estimability given strong rotation excitation
        res = vi_init.inertial_optimization(
            st.R_bw, st.t_bw, edges, g_guess, iters=25,
            prior_g_info=1.0, prior_a_info=1.0,
        )
        np.testing.assert_allclose(np.asarray(res.bias_g), np.asarray(bg), atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.bias_a), np.asarray(ba_true), atol=3e-2)
        g_err = np.degrees(np.arccos(np.clip(
            float(res.gravity @ G) / 9.81 ** 2, -1.0, 1.0
        )))
        assert g_err < 1.0, g_err
        np.testing.assert_allclose(
            np.asarray(res.v), np.asarray(st.v), atol=0.03
        )

    def test_fixed_kf_untouched(self):
        st, X, obs, edges = build_vi_problem()
        st_f, _ = run_vi(st, X, obs, edges, 6, iters=5)
        np.testing.assert_allclose(
            np.asarray(st_f.t_bw[0]), np.asarray(st.t_bw[0]), atol=1e-6
        )
