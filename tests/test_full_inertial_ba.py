"""FullInertialBA (``src/Optimizer.cc:397``): whole-map visual-inertial BA.

Two levels:
- unit: the matrix-free PCG variant (``vi_ba.vi_bundle_adjust_cg``) matches
  the dense windowed solver on the same synthetic VI problem;
- system: on a live stereo-inertial map with injected pose drift, the
  inertial GBA restores IMU consistency (preintegration residuals) where the
  visual-only GBA does not — the reference runs FullInertialBA as the GBA of
  inertial maps (``src/LoopClosing.cc:2287-2289``) for exactly this reason.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.optim import vi_ba
from orb_slam3_detailed_comments_kor_tpu.slam import inertial
from orb_slam3_detailed_comments_kor_tpu.utils import lie

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_vi_ba import BF, CAM, G, build_vi_problem  # noqa: E402
from test_slam_vi_e2e import run_vi_sequence  # noqa: E402


class TestVIBACG:
    def test_cg_recovers_from_perturbation(self):
        st, X, obs, edges = build_vi_problem()
        key = jax.random.PRNGKey(8)
        xi = 0.02 * jax.random.normal(key, (6, 6)).at[0].set(0.0)
        dR, dt = lie.se3_exp(xi)
        dv = 0.05 * jax.random.normal(key, st.v.shape).at[0].set(0.0)
        st0 = st._replace(
            R_bw=dR @ st.R_bw,
            t_bw=jnp.einsum("kij,kj->ki", dR, st.t_bw) + dt,
            v=st.v + dv,
        )
        X0 = X + 0.03 * jax.random.normal(key, X.shape)
        fixed_kf = jnp.zeros((6,), bool).at[0].set(True)
        fixed_point = jnp.zeros((X0.shape[0],), bool)
        st_f, X_f, _ = vi_ba.vi_bundle_adjust_cg(
            st0, X0, obs, edges, fixed_kf, fixed_point, CAM,
            jnp.eye(3), jnp.zeros(3), BF, G,
            gyro_walk_info=vi_ba.WALK_INFO_CAP,
            acc_walk_info=vi_ba.WALK_INFO_CAP,
            iters=12, cg_iters=40,
        )
        p_f = -jnp.einsum("kji,kj->ki", st_f.R_bw, st_f.t_bw)
        p_g = -jnp.einsum("kji,kj->ki", st.R_bw, st.t_bw)
        assert np.abs(np.asarray(p_f - p_g)).max() < 0.015
        assert np.abs(np.asarray(st_f.v - st.v)).max() < 0.06

    def test_bias_prior_keeps_biases_bounded(self):
        """With strong priors and no true bias, the estimated biases stay
        near zero (bFIBA's priorG/priorA semantics)."""
        st, X, obs, edges = build_vi_problem()
        fixed_kf = jnp.zeros((6,), bool).at[0].set(True)
        st_f, _, _ = vi_ba.vi_bundle_adjust_cg(
            st, X, obs, edges, fixed_kf, jnp.zeros((X.shape[0],), bool), CAM,
            jnp.eye(3), jnp.zeros(3), BF, G,
            gyro_walk_info=vi_ba.WALK_INFO_CAP,
            acc_walk_info=vi_ba.WALK_INFO_CAP,
            prior_bg_info=jnp.float32(1e2), prior_ba_info=jnp.float32(1e5),
            iters=6,
        )
        assert np.abs(np.asarray(st_f.bg)).max() < 5e-3
        assert np.abs(np.asarray(st_f.ba)).max() < 5e-2


def _inertial_residual_norm(slam):
    """RMS whitened preintegration residual over the live map's chain."""
    R_bc, t_bc = lie.se3_inverse(slam.R_cb, slam.t_cb)
    R_bw = jnp.einsum("ij,kjl->kil", R_bc, slam.ms.kf_R_cw)
    t_bw = jnp.einsum("ij,kj->ki", R_bc, slam.ms.kf_t_cw) + t_bc
    st = vi_ba.VIState(
        R_bw=R_bw, t_bw=t_bw, v=slam.ikf.vel, bg=slam.ikf.bg, ba=slam.ikf.ba
    )
    K = slam.ms.K
    ks = jnp.arange(1, K)
    floor = jnp.diag(jnp.asarray(vi_ba.COV_FLOOR, jnp.float32) ** 2)
    edges = vi_ba.InertialEdges(
        i=(ks - 1).astype(jnp.int32), j=ks.astype(jnp.int32),
        dt=slam.ikf.pre_dt[ks], dR=slam.ikf.pre_dR[ks],
        dV=slam.ikf.pre_dV[ks], dP=slam.ikf.pre_dP[ks],
        info9=jnp.linalg.inv(slam.ikf.pre_cov[ks] + floor[None]),
        JRg=slam.ikf.pre_JRg[ks], JVg=slam.ikf.pre_JVg[ks],
        JVa=slam.ikf.pre_JVa[ks], JPg=slam.ikf.pre_JPg[ks],
        JPa=slam.ikf.pre_JPa[ks],
        bias_g0=slam.ikf.pre_bg0[ks], bias_a0=slam.ikf.pre_ba0[ks],
        valid=slam.ikf.pre_valid[ks] & slam.ms.kf_valid[ks]
        & slam.ms.kf_valid[ks - 1],
    )
    r, _ = vi_ba.eval_inertial(st, edges, slam.gravity)
    chi = jnp.einsum("ei,eij,ej->e", r, edges.info9, r) * edges.valid
    return float(jnp.sqrt(jnp.sum(chi) / jnp.maximum(jnp.sum(edges.valid), 1)))


class TestFullInertialBAOnMap:
    @pytest.fixture(scope="class")
    def drifted(self):
        slam, gt = run_vi_sequence(110)
        slam.flush_decisions()
        assert slam.imu_initialized
        # inject a rigid yaw+translation drift into the last 1/3 of the KF
        # chain (what a long loopy circuit accumulates before correction)
        n_kf = slam.n_kf
        k0 = 2 * n_kf // 3
        kk = np.arange(slam.ms.K)
        late = (kk >= k0) & (kk < n_kf)
        dR, dt = lie.se3_exp(jnp.array([0.0, 0.0, 0.0, 0.03, -0.02, 0.04]))
        R_new = jnp.where(
            jnp.asarray(late)[:, None, None],
            jnp.einsum("kij,jl->kil", slam.ms.kf_R_cw, dR.T),
            slam.ms.kf_R_cw,
        )
        t_new = jnp.where(
            jnp.asarray(late)[:, None],
            slam.ms.kf_t_cw
            - jnp.einsum("kij,jl,l->ki", slam.ms.kf_R_cw, dR.T, dt),
            slam.ms.kf_t_cw,
        )
        ms_drift = slam.ms._replace(kf_R_cw=R_new, kf_t_cw=t_new)
        return slam, ms_drift

    def test_inertial_gba_beats_visual_gba_on_imu_consistency(self, drifted):
        from orb_slam3_detailed_comments_kor_tpu.slam import loop_closing

        slam, ms_drift = drifted
        ikf0, ms0 = slam.ikf, slam.ms

        # (a) visual-only GBA (what rounds 1-2 ran on inertial maps)
        slam.ms, _ = loop_closing._global_ba_core(
            ms_drift, slam.cam_params, jnp.float32(slam.cfg.camera.bf),
        )
        r_vis = _inertial_residual_norm(slam)

        # (b) FullInertialBA
        slam.ms = ms_drift
        slam.ms, slam.ikf, _ = inertial.full_inertial_ba(
            slam.ms, slam.ikf, slam.gravity, slam.cam_params,
            slam.R_cb, slam.t_cb, slam.cfg.camera.bf, iters=8,
        )
        r_full = _inertial_residual_norm(slam)
        slam.ms, slam.ikf = ms0, ikf0

        # the inertial GBA must restore IMU consistency markedly better
        assert r_full < 0.7 * r_vis, (r_full, r_vis)

    def test_full_iba_improves_visual_geometry_too(self, drifted):
        slam, ms_drift = drifted
        ikf0, ms0 = slam.ikf, slam.ms
        ms_f, _, _ = inertial.full_inertial_ba(
            ms_drift, slam.ikf, slam.gravity, slam.cam_params,
            slam.R_cb, slam.t_cb, slam.cfg.camera.bf, iters=8,
        )
        # drifted KF positions move back toward the pre-drift chain
        n_kf = slam.n_kf
        k0 = 2 * n_kf // 3
        c_ref = np.asarray(
            -jnp.einsum("kji,kj->ki", ms0.kf_R_cw, ms0.kf_t_cw)
        )[k0:n_kf]
        c_drift = np.asarray(
            -jnp.einsum("kji,kj->ki", ms_drift.kf_R_cw, ms_drift.kf_t_cw)
        )[k0:n_kf]
        c_fixed = np.asarray(
            -jnp.einsum("kji,kj->ki", ms_f.kf_R_cw, ms_f.kf_t_cw)
        )[k0:n_kf]
        err_before = np.linalg.norm(c_drift - c_ref, axis=-1).mean()
        err_after = np.linalg.norm(c_fixed - c_ref, axis=-1).mean()
        assert err_after < 0.6 * err_before, (err_after, err_before)
        slam.ms, slam.ikf = ms0, ikf0
