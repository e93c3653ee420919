"""Deterministic loop-closing test with injected drift.

Natural drift on short synthetic sequences stays inside the tracker's
matching radius (the map simply gets reused — same as the reference), so
this test builds a clean map, then *injects* a known drift into the newest
keyframes + their landmarks (exactly the state a long drifting circuit
produces) and checks the detect → verify → correct pipeline undoes it."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem
from orb_slam3_detailed_comments_kor_tpu.utils import lie

import sys
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import small_config, H, W, FX, BASELINE


def build_map_two_passes():
    """Out-and-back so early and late keyframes see the same scene."""
    cfg = small_config()
    cfg = dataclasses.replace(
        cfg, tracking=dataclasses.replace(cfg.tracking, max_frames_between_kf=4)
    )
    slam = SlamSystem(cfg)
    slam.enable_loop_closing = False  # build the map quietly
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    Rs, ts = synthetic.make_trajectory(80, motion="outback", speed=0.045)
    for i in range(80):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        slam.track_stereo(il, ir, i / 20.0)
    return slam


class TestInjectedLoop:
    @pytest.fixture(scope="class")
    def slam(self):
        return build_map_two_passes()

    def test_injected_drift_corrected(self, slam):
        ms = slam.ms
        n_kf = slam.n_kf
        assert n_kf >= 12, n_kf
        kf_idx = n_kf - 1

        # ---- inject drift: rigidly displace the last third of the map ----
        # Real drift breaks data association: the drifted keyframes observe
        # their own DUPLICATE landmarks, not the originals. Simulate that by
        # (a) warping late poses, (b) duplicating the last keyframe's
        # landmarks at warped positions and repointing its obs row.
        from orb_slam3_detailed_comments_kor_tpu.slam import map_state as msx2

        drift_xi = jnp.array([0.06, -0.04, 0.05, 0.015, -0.02, 0.01])
        R_d, t_d = lie.se3_exp(drift_xi)  # world-warp D (drift)
        cut = 2 * n_kf // 3
        late = jnp.arange(ms.K) >= cut
        Rd_i, td_i = lie.se3_inverse(R_d, t_d)
        R_new, t_new = lie.se3_compose(
            ms.kf_R_cw, ms.kf_t_cw, Rd_i[None].repeat(ms.K, 0),
            jnp.broadcast_to(td_i, (ms.K, 3)),
        )
        ms_drift = ms._replace(
            kf_R_cw=jnp.where(late[:, None, None], R_new, ms.kf_R_cw),
            kf_t_cw=jnp.where(late[:, None], t_new, ms.kf_t_cw),
        )
        # duplicate the last KF's observed landmarks at drifted positions
        row = ms.obs_lm[kf_idx]
        want = row >= 0
        slots = msx2.allocate_slots(~ms.lm_valid, want)
        got = slots >= 0
        sl = jnp.where(got, slots, ms.L)
        old_lm = jnp.clip(row, 0)
        X_dup = ms.lm_pos[old_lm] @ R_d.T + t_d
        ms_drift = ms_drift._replace(
            lm_pos=ms_drift.lm_pos.at[sl].set(X_dup, mode="drop"),
            lm_valid=ms_drift.lm_valid.at[sl].set(True, mode="drop"),
            lm_first_kf=ms_drift.lm_first_kf.at[sl].set(
                jnp.full((ms.N,), kf_idx, jnp.int32), mode="drop"
            ),
            obs_lm=ms_drift.obs_lm.at[kf_idx].set(
                jnp.where(got, slots, row)
            ),
        )

        # ---- detection: BoW must point the last KF at an early one -------
        lc = slam.loop_closer
        lc._consecutive = 0
        lc._last_cand = -1
        # backfill database (loop closing was disabled during build)
        from orb_slam3_detailed_comments_kor_tpu.ops import orb as orb_ops

        for k in range(n_kf):
            lc.add_keyframe(
                k, orb_ops.unpack_descriptors(ms.kf_desc[k]),
                ms.kf_feat_valid[k],
            )
        cand = -1
        for _ in range(lc.consistency_needed):
            cand = lc.detect(ms_drift, kf_idx, n_kf)
        assert cand >= 0, "BoW failed to suggest a loop candidate"
        assert cand < cut  # early keyframe

        # ---- verify: Horn RANSAC must recover the injected drift ---------
        key = jax.random.PRNGKey(42)
        ok, R_est, t_est, _s = lc.verify(ms_drift, kf_idx, cand, key)
        assert ok, "geometric verification failed"
        # estimated world-warp should be D⁻¹ (drifted → correct)
        rot_err = np.degrees(
            np.linalg.norm(np.asarray(lie.so3_log(R_est @ R_d)))
        )
        assert rot_err < 1.0, rot_err

        # ---- correct: pose graph + landmark re-anchoring -----------------
        ms_fixed = lc.correct(
            ms_drift, n_kf, kf_idx, cand, R_est, t_est,
            slam.cam_params, slam.cfg.camera.bf, run_gba=False,
        )
        # late keyframes must be pulled back toward their pre-drift poses
        err_before = float(
            jnp.abs(ms_drift.kf_t_cw[kf_idx] - ms.kf_t_cw[kf_idx]).max()
        )
        err_after = float(
            jnp.abs(ms_fixed.kf_t_cw[kf_idx] - ms.kf_t_cw[kf_idx]).max()
        )
        # >50% of the injected drift must be recovered WITHOUT GBA (the
        # pose graph alone; GBA tightens further). Not tighter: the exact
        # residual varies with XLA:CPU reduction order under load (the
        # 0.35 margin flipped to 0.44 when the suite ran contended).
        assert err_after < 0.5 * err_before, (err_before, err_after)


class TestInjectedSim3Loop:
    """Monocular-style loop correction: the injected drift includes SCALE
    (mono maps drift in scale); verification must estimate it
    (Sim3Solver bFixScale=false) and the Sim3 essential graph must undo it
    (OptimizeEssentialGraph, Optimizer.cc:2113)."""

    @pytest.fixture(scope="class")
    def slam(self):
        return build_map_two_passes()

    def test_injected_sim3_drift_corrected(self, slam):
        ms = slam.ms
        n_kf = slam.n_kf
        kf_idx = n_kf - 1
        from orb_slam3_detailed_comments_kor_tpu.slam import map_state as msx2

        # ---- inject Sim3 drift: warp late map by D = (R_d, t_d, s_d) -----
        R_d, t_d = lie.se3_exp(
            jnp.array([0.05, -0.03, 0.04, 0.012, -0.015, 0.008])
        )
        s_d = jnp.float32(1.18)
        cut = 2 * n_kf // 3
        late = jnp.arange(ms.K) >= cut
        # camera pose under a world sim3 warp: S_cw' = S_cw ∘ D⁻¹, folded
        # to SE3 as [R | t/s]
        Rd_i, td_i, sd_i = lie.sim3_inverse(R_d, t_d, s_d)
        R_new, t_new, s_new = lie.sim3_compose(
            ms.kf_R_cw, ms.kf_t_cw, jnp.ones((ms.K,)),
            jnp.broadcast_to(Rd_i, (ms.K, 3, 3)),
            jnp.broadcast_to(td_i, (ms.K, 3)),
            jnp.broadcast_to(sd_i, (ms.K,)),
        )
        t_new = t_new / s_new[:, None]
        ms_drift = ms._replace(
            kf_R_cw=jnp.where(late[:, None, None], R_new, ms.kf_R_cw),
            kf_t_cw=jnp.where(late[:, None], t_new, ms.kf_t_cw),
        )
        row = ms.obs_lm[kf_idx]
        want = row >= 0
        slots = msx2.allocate_slots(~ms.lm_valid, want)
        got = slots >= 0
        sl = jnp.where(got, slots, ms.L)
        old_lm = jnp.clip(row, 0)
        X_dup = s_d * (ms.lm_pos[old_lm] @ R_d.T) + t_d
        ms_drift = ms_drift._replace(
            lm_pos=ms_drift.lm_pos.at[sl].set(X_dup, mode="drop"),
            lm_valid=ms_drift.lm_valid.at[sl].set(True, mode="drop"),
            lm_first_kf=ms_drift.lm_first_kf.at[sl].set(
                jnp.full((ms.N,), kf_idx, jnp.int32), mode="drop"
            ),
            obs_lm=ms_drift.obs_lm.at[kf_idx].set(
                jnp.where(got, slots, row)
            ),
        )

        lc = slam.loop_closer
        lc._consecutive = 0
        lc._last_cand = -1
        from orb_slam3_detailed_comments_kor_tpu.ops import orb as orb_ops

        for k in range(slam.n_kf):
            lc.add_keyframe(
                k, orb_ops.unpack_descriptors(ms.kf_desc[k]),
                ms.kf_feat_valid[k],
            )
        cand = -1
        for _ in range(lc.consistency_needed):
            cand = lc.detect(ms_drift, kf_idx, n_kf)
        assert cand >= 0 and cand < cut

        # ---- verify with free scale: must recover s ≈ 1/s_d --------------
        key = jax.random.PRNGKey(7)
        ok, R_est, t_est, s_est = lc.verify(
            ms_drift, kf_idx, cand, key, fix_scale=False
        )
        assert ok
        assert abs(float(s_est) - 1.0 / float(s_d)) < 0.05, float(s_est)

        # ---- correct with the Sim3 essential graph -----------------------
        ms_fixed = lc.correct(
            ms_drift, n_kf, kf_idx, cand, R_est, t_est,
            slam.cam_params, slam.cfg.camera.bf, run_gba=False,
            mode="sim3", s_delta=s_est,
        )
        err_before = float(
            jnp.abs(ms_drift.kf_t_cw[kf_idx] - ms.kf_t_cw[kf_idx]).max()
        )
        err_after = float(
            jnp.abs(ms_fixed.kf_t_cw[kf_idx] - ms.kf_t_cw[kf_idx]).max()
        )
        # >50% of the injected drift must be recovered WITHOUT GBA (the
        # pose graph alone; GBA tightens further). Not tighter: the exact
        # residual varies with XLA:CPU reduction order under load (the
        # 0.35 margin flipped to 0.44 when the suite ran contended).
        assert err_after < 0.5 * err_before, (err_before, err_after)
