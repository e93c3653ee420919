"""Monocular SLAM tests: two-view bootstrap + tracking + scale-aligned ATE
(mono_euroc analog; TwoViewReconstruction + MonocularInitialization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.eval import ate
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.ops import twoview
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem, TrackingState
from orb_slam3_detailed_comments_kor_tpu.utils import lie

import sys, dataclasses
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_slam_e2e import small_config, H, W, FX
from orb_slam3_detailed_comments_kor_tpu.config import SensorType


class TestTwoView:
    def test_reconstruct_known_motion(self):
        key = jax.random.PRNGKey(13)
        X = jax.random.uniform(
            key, (200, 3), minval=jnp.array([-2.0, -1.5, 2.0]),
            maxval=jnp.array([2.0, 1.5, 6.0]),
        )
        R_gt = lie.so3_exp(jnp.array([0.02, -0.05, 0.01]))
        t_gt = jnp.array([0.3, 0.05, 0.1])
        t_gt_u = t_gt / jnp.linalg.norm(t_gt)
        rays_a = X / X[:, 2:3]
        Xb = X @ R_gt.T + t_gt
        rays_b = Xb / Xb[:, 2:3]
        # 20% outliers
        out = jax.random.uniform(key, (200,)) < 0.2
        rays_b = jnp.where(out[:, None], rays_b + 0.05, rays_b)
        tv = twoview.reconstruct_two_views(
            rays_a, rays_b, jnp.ones((200,), bool), key, inlier_th=1e-8
        )
        assert bool(tv.ok)
        rot_err = np.degrees(
            np.linalg.norm(np.asarray(lie.so3_log(tv.R_ba @ R_gt.T)))
        )
        assert rot_err < 0.5, rot_err
        # translation up to scale
        cos = float(jnp.abs(tv.t_ba @ t_gt_u))
        assert cos > 0.999, cos
        # triangulated structure matches up to the global scale
        s = float(jnp.nanmedian(jnp.where(tv.inlier, tv.X[:, 2] / X[:, 2], jnp.nan)))
        rel = np.asarray(jnp.linalg.norm(tv.X / s - X, axis=-1))[
            np.asarray(tv.inlier)
        ]
        assert np.median(rel) < 0.02


class TestMonoSlam:
    def test_mono_sequence(self):
        cfg = small_config()
        cfg = dataclasses.replace(cfg, sensor=SensorType.MONOCULAR)
        slam = SlamSystem(cfg)
        params = jnp.array([FX, FX, W / 2.0, H / 2.0])
        scene = synthetic.default_scene()
        # translation-rich motion for parallax
        Rs, ts = synthetic.make_trajectory(50, motion="strafe", speed=0.05)
        for i in range(50):
            img, _ = synthetic.render(
                params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), scene, h=H, w=W
            )
            slam.track_mono(img, i / 20.0)
        assert slam.state == TrackingState.OK
        assert slam.n_kf >= 3
        _, centers, _ = slam.trajectory_arrays()
        # mono is up-to-scale: align WITH scale
        rmse = ate.ate_rmse(centers, ts[: len(centers)], with_scale=True)
        assert rmse < 0.05, f"scale-aligned ATE {rmse*1000:.1f}mm"


class TestHomographyInit:
    def test_planar_scene_homography_model(self):
        """On a purely planar scene E is degenerate; the H pipeline must
        recover the motion (ReconstructH / Faugeras decomposition)."""
        key = jax.random.PRNGKey(3)
        # points on the plane z = 4 + 0.3x + 0.2y
        uv = jax.random.uniform(key, (300, 2), minval=-1.5, maxval=1.5)
        X = jnp.stack(
            [uv[:, 0] * 2.0, uv[:, 1] * 1.5,
             4.0 + 0.3 * uv[:, 0] + 0.2 * uv[:, 1]], axis=-1
        )
        R_gt = lie.so3_exp(jnp.array([0.03, -0.06, 0.02]))
        t_gt = jnp.array([0.4, 0.1, 0.05])
        rays_a = X / X[:, 2:3]
        Xb = X @ R_gt.T + t_gt
        rays_b = Xb / Xb[:, 2:3]
        tv = twoview.reconstruct_two_views_hf(
            rays_a, rays_b, jnp.ones((300,), bool), key, inlier_th=1e-8
        )
        assert bool(tv.ok)
        rot_err = np.degrees(
            np.linalg.norm(np.asarray(lie.so3_log(tv.R_ba @ R_gt.T)))
        )
        assert rot_err < 1.0, rot_err
        t_u = t_gt / jnp.linalg.norm(t_gt)
        cos = float(jnp.abs(tv.t_ba @ t_u))
        assert cos > 0.995, cos

    def test_general_scene_unchanged(self):
        """Non-planar scenes must keep the essential-matrix solution."""
        key = jax.random.PRNGKey(13)
        X = jax.random.uniform(
            key, (200, 3), minval=jnp.array([-2.0, -1.5, 2.0]),
            maxval=jnp.array([2.0, 1.5, 6.0]),
        )
        R_gt = lie.so3_exp(jnp.array([0.02, -0.05, 0.01]))
        t_gt = jnp.array([0.3, 0.05, 0.1])
        rays_a = X / X[:, 2:3]
        Xb = X @ R_gt.T + t_gt
        rays_b = Xb / Xb[:, 2:3]
        tv = twoview.reconstruct_two_views_hf(
            rays_a, rays_b, jnp.ones((200,), bool), key, inlier_th=1e-8
        )
        assert bool(tv.ok)
        rot_err = np.degrees(
            np.linalg.norm(np.asarray(lie.so3_log(tv.R_ba @ R_gt.T)))
        )
        assert rot_err < 0.5, rot_err
