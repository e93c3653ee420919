"""Drift-plausibility gate boundary coverage (VERDICT r4 weak-5 / next-6).

The gate (``system.SlamSystem._loop_gate_allows``) rejects loop
corrections that displace the current keyframe by more than the drift the
trajectory could plausibly have accumulated since the candidate. The
reference has no such gate — it leans on its 1M-word vocabulary's
distinctiveness (``LoopClosing.cc:328-615``) — so this failure mode is
repo-specific and needs explicit boundary tests:

- a genuine closure whose correction is just UNDER the budget on a short
  arc must be accepted;
- just OVER must be rejected (the perceptual-aliasing defense);
- a trajectory with honest large drift (> the nominal 15 % of arc) must
  remain closeable via the quality-scaled escape hatch: keyframes
  inserted under degraded tracking widen their segments' budget to 50 %.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import small_config

from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem
from orb_slam3_detailed_comments_kor_tpu.utils import lie


def make_system_with_line_map(n_kf=12, step=0.5, lowq=None):
    """A SlamSystem whose map is a straight line of keyframes spaced
    ``step`` metres apart (arc length = (n_kf-1)*step); no images needed —
    the gate only reads poses and the host quality mirror."""
    cfg = small_config()
    slam = SlamSystem(cfg)
    ms = slam.ms
    for k in range(n_kf):
        c = jnp.array([k * step, 0.0, 0.0])
        ms = ms._replace(
            kf_R_cw=ms.kf_R_cw.at[k].set(jnp.eye(3)),
            kf_t_cw=ms.kf_t_cw.at[k].set(-c),  # R=I: t_cw = -center
            kf_valid=ms.kf_valid.at[k].set(True),
            kf_time=ms.kf_time.at[k].set(float(k)),
        )
    slam.ms = ms
    slam.n_kf = n_kf
    slam._kf_lowq_host = list(lowq) if lowq is not None else [False] * n_kf
    return slam


def gate(slam, disp, mode="se3", cand=0, kf_idx=None):
    """Run the gate for a pure-translation correction of magnitude disp."""
    kf_idx = slam.n_kf - 1 if kf_idx is None else kf_idx
    # world-warp W: x -> x + d applied to the current KF's center
    t_d = jnp.array([0.0, disp, 0.0])
    return slam._loop_gate_allows(
        kf_idx, cand, jnp.eye(3), t_d, jnp.float32(1.0), mode
    )


class TestGateBoundary:
    def test_just_under_budget_accepted_short_arc(self):
        """Genuine closure with drift near the budget on a SHORT arc: the
        budget is 15% * arc + 10*baseline; displacement 5% under must
        pass."""
        slam = make_system_with_line_map(n_kf=6, step=0.4)  # arc = 2.0 m
        allowed = 0.15 * 2.0 + 10.0 * max(slam.baseline, 0.01)
        assert gate(slam, 0.95 * allowed)

    def test_just_over_budget_rejected(self):
        slam = make_system_with_line_map(n_kf=6, step=0.4)
        allowed = 0.15 * 2.0 + 10.0 * max(slam.baseline, 0.01)
        assert not gate(slam, 1.05 * allowed)

    def test_aliasing_scale_warp_rejected(self):
        """The corridor failure: a multi-metre warp on a modest arc (3.86 m
        apparent displacement after ~5 m of travel) must be rejected."""
        slam = make_system_with_line_map(n_kf=11, step=0.5)  # arc = 5 m
        assert not gate(slam, 3.86)

    def test_high_drift_closeable_with_lowq_history(self):
        """Honest large drift (>15% of arc) happens when tracking is
        degraded; with the low-quality mirror set over the drifting
        stretch the widened budget (50%/segment) must accept it, while
        the same displacement with a clean history is rejected."""
        n_kf, step = 11, 0.5  # arc = 5 m
        disp = 0.30 * 5.0 + 10.0 * 0.11 * 0.9  # ~30% of arc + most of floor
        clean = make_system_with_line_map(n_kf, step)
        assert not gate(clean, disp), "sanity: over the clean budget"
        lowq = [False] * 3 + [True] * 8  # degraded back half
        degraded = make_system_with_line_map(n_kf, step, lowq=lowq)
        assert gate(degraded, disp), (
            "escape hatch: degraded-tracking history must widen the budget"
        )

    def test_mono_budget_looser(self):
        """Sim3 (mono) mode keeps a looser budget than metric modes."""
        slam = make_system_with_line_map(n_kf=11, step=0.5)
        allowed_metric = 0.15 * 5.0 + 10.0 * max(slam.baseline, 0.01)
        disp = 1.5 * allowed_metric
        assert not gate(slam, disp, mode="se3")
        assert gate(slam, disp, mode="sim3")

    def test_quality_mirror_tracks_insertions(self):
        """End-to-end wiring: keyframes inserted by a real run populate
        the quality mirror (one entry per keyframe)."""
        import jax.numpy as jnp2

        from orb_slam3_detailed_comments_kor_tpu.io import synthetic
        from test_slam_e2e import BASELINE, FX, H, W

        cfg = small_config()
        slam = SlamSystem(cfg)
        params = jnp2.array([FX, FX, W / 2.0, H / 2.0])
        scene = synthetic.default_scene()
        Rs, ts = synthetic.make_trajectory(24, motion="strafe", speed=0.03)
        for i in range(24):
            il, ir, _ = synthetic.stereo_pair(
                params, jnp2.asarray(Rs[i]), jnp2.asarray(ts[i]), BASELINE,
                scene, h=H, w=W,
            )
            slam.track_stereo(il, ir, i / 20.0)
        slam.flush_decisions()
        assert len(slam._kf_lowq_host) == slam.n_kf
        # clean synthetic tracking is high-quality throughout
        assert not any(slam._kf_lowq_host[1:])
