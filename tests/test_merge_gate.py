"""Merge-plausibility gate (r5: the cross-map analog of the loop-closing
drift gate). A new Atlas map is born at the old map's last tracked pose,
so a later merge transform must stay within drift-plausible range of that
recorded prior — perceptual aliasing passes BoW + PnP verification across
maps with transforms metres-to-tens-of-metres off (observed on the r5
corridor run: an aliased cross-map merge warped the pose by ~40 m).
Reference: the merge path ``LoopClosing.cc:1288`` has no such gate (it
leans on vocabulary distinctiveness), same rationale as the loop gate.
"""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import small_config

from orb_slam3_detailed_comments_kor_tpu.slam import map_merging
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem


def make_slam_with_line_kfs(n_kf=6, step=0.2):
    slam = SlamSystem(small_config())
    ms = slam.ms
    for k in range(n_kf):
        c = jnp.array([k * step, 0.0, 0.0])
        ms = ms._replace(
            kf_R_cw=ms.kf_R_cw.at[k].set(jnp.eye(3)),
            kf_t_cw=ms.kf_t_cw.at[k].set(-c),
            kf_valid=ms.kf_valid.at[k].set(True),
        )
    slam.ms = ms
    slam.n_kf = n_kf
    # live camera at the last keyframe
    slam.R_cw = jnp.eye(3)
    slam.t_cw = -jnp.array([(n_kf - 1) * step, 0.0, 0.0])
    return slam


def shelf_with_prior(c_loss):
    """Shelf whose map lost tracking with the camera at center c_loss
    (identity orientation): T_cw_loss = [I | -c_loss]."""
    return {"merge_prior": (np.eye(3), -np.asarray(c_loss, np.float64), 0.0)}


class TestMergeGate:
    def test_honest_rejoin_allowed(self):
        """New map drifted ~0.2 m from where it split off: the merge
        transform near the recorded prior must pass."""
        slam = make_slam_with_line_kfs()
        c_loss = [5.0, 0.0, 0.0]
        shelf = shelf_with_prior(c_loss)
        # expected D: X_old = X_new + c_loss; honest drift 0.2 m
        R_d = jnp.eye(3)
        t_d = jnp.array([5.0, 0.2, 0.0])
        assert map_merging._merge_gate_allows(slam, shelf, R_d, t_d)

    def test_aliased_merge_rejected(self):
        """A corridor-aliased candidate produces a transform metres off
        the prior on a short post-split arc: reject."""
        slam = make_slam_with_line_kfs()  # arc = 1.0 m
        shelf = shelf_with_prior([5.0, 0.0, 0.0])
        R_d = jnp.eye(3)
        t_d = jnp.array([-5.0, 0.0, 0.0])  # 10 m off the prior
        assert not map_merging._merge_gate_allows(slam, shelf, R_d, t_d)

    def test_rotated_alias_rejected(self):
        """A transform that matches the current camera CENTER but carries
        a large rotation (the in-budget aliased weld mode observed on the
        r5 corridor: tens-of-metres warp of everything away from the
        anchor point) must be rejected by the rotation check."""
        from orb_slam3_detailed_comments_kor_tpu.utils import lie
        import jax.numpy as jnp3

        slam = make_slam_with_line_kfs()
        c_loss = np.array([5.0, 0.0, 0.0])
        shelf = shelf_with_prior(c_loss)
        c = np.asarray(slam.camera_center())
        R_d = np.asarray(lie.so3_exp(jnp3.array([0.0, 0.6, 0.0])))  # ~34 deg
        # choose t_d so the hypothesis still maps the current center to
        # exactly the expected spot: t_d = d_exp - R_d @ c
        d_exp = c + c_loss
        t_d = d_exp - R_d @ c
        assert not map_merging._merge_gate_allows(
            slam, shelf, jnp3.asarray(R_d), jnp3.asarray(t_d)
        )

    def test_missing_prior_skips_gate(self):
        slam = make_slam_with_line_kfs()
        assert map_merging._merge_gate_allows(
            slam, {}, jnp.eye(3), jnp.array([1.0, 0.0, 0.0])
        )

    def test_budget_scales_with_arc(self):
        """A long post-split excursion earns a larger deviation budget."""
        slam_short = make_slam_with_line_kfs(n_kf=3, step=0.2)  # arc 0.4
        slam_long = make_slam_with_line_kfs(n_kf=31, step=0.4)  # arc 12
        shelf = shelf_with_prior([5.0, 0.0, 0.0])
        R_d = jnp.eye(3)
        t_d = jnp.array([5.0, 4.5, 0.0])  # 4.5 m deviation
        assert not map_merging._merge_gate_allows(slam_short, shelf, R_d, t_d)
        assert map_merging._merge_gate_allows(slam_long, shelf, R_d, t_d)

    def test_shelving_records_prior(self):
        """_create_map_in_atlas stores the loss pose for the future gate."""
        import dataclasses

        import jax.numpy as jnp2

        from orb_slam3_detailed_comments_kor_tpu.io import synthetic
        from test_slam_e2e import BASELINE, FX, H, W

        cfg = small_config()
        slam = SlamSystem(cfg)
        params = jnp2.array([FX, FX, W / 2.0, H / 2.0])
        scene = synthetic.default_scene()
        Rs, ts = synthetic.make_trajectory(30, motion="strafe", speed=0.03)
        for i in range(30):
            il, ir, _ = synthetic.stereo_pair(
                params, jnp2.asarray(Rs[i]), jnp2.asarray(ts[i]), BASELINE,
                scene, h=H, w=W,
            )
            slam.track_stereo(il, ir, i / 20.0)
        slam.flush_decisions()
        assert slam.n_kf >= 2
        slam._create_map_in_atlas()
        prior = slam.atlas_maps[-1].get("merge_prior")
        assert prior is not None
        R_loss, t_loss, t_at, coast_s = prior
        assert R_loss.shape == (3, 3) and t_loss.shape == (3,)
