"""Camera model tests: project∘unproject identity, Jacobians vs autodiff
(reference: GeometricCamera.h:44-78, Pinhole.cpp, KannalaBrandt8.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.models import camera
from orb_slam3_detailed_comments_kor_tpu.utils import lie

KEY = jax.random.PRNGKey(1)
PINHOLE = jnp.array([458.654, 457.296, 367.215, 248.375])
KB8 = jnp.array([190.978, 190.973, 254.932, 256.897, 0.00348, 0.000715, -0.00205, 0.000581])


def rand_points(key, n=128):
    x = jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0)
    return x.at[:, 2].set(jnp.abs(x[:, 2]) * 4 + 0.5)


class TestPinhole:
    def test_project_unproject(self):
        xyz = rand_points(KEY)
        uv = camera.pinhole_project(PINHOLE, xyz)
        ray = camera.pinhole_unproject(PINHOLE, uv)
        # ray is unit-depth: scale by true z recovers the point
        np.testing.assert_allclose(
            np.asarray(ray * xyz[:, 2:3]), np.asarray(xyz), rtol=1e-4, atol=1e-4
        )

    def test_jacobian_matches_autodiff(self):
        xyz = rand_points(KEY, 16)
        J = camera.pinhole_project_jac(PINHOLE, xyz)
        Jad = jax.vmap(jax.jacfwd(lambda p: camera.pinhole_project(PINHOLE, p)))(xyz)
        np.testing.assert_allclose(np.asarray(J), np.asarray(Jad), rtol=1e-4, atol=1e-4)

    def test_distort_undistort(self):
        dist = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05)
        xn = jax.random.uniform(KEY, (64, 2), minval=-0.5, maxval=0.5)
        xd = camera.distort_radtan(dist, xn)
        xn2 = camera.undistort_radtan(dist, xd)
        np.testing.assert_allclose(np.asarray(xn), np.asarray(xn2), atol=1e-5)


class TestKB8:
    def test_project_unproject(self):
        xyz = rand_points(KEY)
        uv = camera.kb8_project(KB8, xyz)
        ray = camera.kb8_unproject(KB8, uv)
        np.testing.assert_allclose(
            np.asarray(ray * xyz[:, 2:3]), np.asarray(xyz), rtol=1e-3, atol=1e-3
        )

    def test_wide_angle(self):
        # fisheye handles >90° off-axis points
        xyz = jnp.array([[3.0, 0.0, 1.0], [0.0, -2.5, 0.8]])
        uv = camera.kb8_project(KB8, xyz)
        ray = camera.kb8_unproject(KB8, uv)
        dir1 = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        dir2 = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(dir1), np.asarray(dir2), atol=1e-4)

    def test_principal_point(self):
        xyz = jnp.array([[0.0, 0.0, 2.0]])
        uv = camera.kb8_project(KB8, xyz)
        np.testing.assert_allclose(np.asarray(uv[0]), [254.932, 256.897], atol=1e-4)

    def test_jacobian_shape(self):
        xyz = rand_points(KEY, 8)
        J = camera.kb8_project_jac(KB8, xyz)
        assert J.shape == (8, 2, 3)

    def test_jit(self):
        xyz = rand_points(KEY, 8)
        f = jax.jit(lambda p: camera.kb8_unproject(KB8, camera.kb8_project(KB8, p)))
        r = f(xyz)
        assert r.shape == (8, 3)


def test_frontend_keypoint_undistortion():
    """process_mono(dist=...) must map raw keypoints through the inverse
    radial-tangential model (Frame::UndistortKeyPoints, Frame.cc:733)."""
    import numpy as np
    from orb_slam3_detailed_comments_kor_tpu.io import synthetic
    from orb_slam3_detailed_comments_kor_tpu.models import camera as cm
    from orb_slam3_detailed_comments_kor_tpu.slam import frontend

    H, W, FX = 240, 376, 230.0
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    img, _ = synthetic.render(params, jnp.eye(3), jnp.zeros(3), scene,
                              h=H, w=W)
    dist = (-0.28, 0.07, 1e-4, -2e-5)
    f_raw = frontend.process_mono(img, n_features=300, cell=24)
    f_und = frontend.process_mono(img, n_features=300, cell=24,
                                  dist=dist, cam_params=params)
    # manual undistortion of the raw coordinates
    xn = jnp.stack([(f_raw.xy[:, 0] - W / 2.0) / FX,
                    (f_raw.xy[:, 1] - H / 2.0) / FX], axis=-1)
    xu = cm.undistort_radtan(jnp.asarray(dist), xn)
    expect = jnp.stack([FX * xu[:, 0] + W / 2.0,
                        FX * xu[:, 1] + H / 2.0], axis=-1)
    v = np.asarray(f_raw.valid)
    np.testing.assert_allclose(
        np.asarray(f_und.xy)[v], np.asarray(expect)[v], atol=1e-3
    )
    # the shift is real (distortion actually moved the points)
    assert np.abs(np.asarray(f_und.xy - f_raw.xy)[v]).max() > 1.0


class TestMLPnP:
    """mlpnp_refine: tangent-space ML polish (MLPnPsolver parity)."""

    def _scene(self, seed=0, n=160, noise_px=0.6):
        rng = np.random.default_rng(seed)
        X = rng.uniform([-4, -3, 2.0], [4, 3, 30.0], (n, 3))
        R_true = np.asarray(lie.so3_exp(jnp.array([0.05, -0.1, 0.03])))
        t_true = np.array([0.3, -0.2, 0.5])
        cam = jnp.array([458.0, 458.0, 376.0, 240.0])
        pc = X @ R_true.T + t_true
        uv = np.stack(
            [458.0 * pc[:, 0] / pc[:, 2] + 376.0,
             458.0 * pc[:, 1] / pc[:, 2] + 240.0], -1
        ) + rng.normal(0, noise_px, (n, 2))
        return X, uv, cam, R_true, t_true

    def test_refine_recovers_pose_from_perturbed_init(self):
        from orb_slam3_detailed_comments_kor_tpu.ops import ransac

        X, uv, cam, R_true, t_true = self._scene()
        dR = np.asarray(lie.so3_exp(jnp.array([0.02, 0.015, -0.01])))
        R0 = jnp.asarray(dR @ R_true)
        t0 = jnp.asarray(t_true + np.array([0.05, -0.04, 0.08]))
        w = jnp.ones((X.shape[0],))
        R, t = ransac.mlpnp_refine(
            jnp.asarray(X, jnp.float32), jnp.asarray(uv, jnp.float32),
            w, cam, R0, t0, iters=8,
        )
        rot_err = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(R) @ R_true.T) - 1) / 2, -1, 1)))
        assert rot_err < 0.05, rot_err
        assert np.linalg.norm(np.asarray(t) - t_true) < 0.02

    def test_pnp_ransac_with_ml_polish_beats_tolerance(self):
        from orb_slam3_detailed_comments_kor_tpu.ops import ransac

        X, uv, cam, R_true, t_true = self._scene(seed=3)
        # 20% outliers
        rng = np.random.default_rng(4)
        out = rng.random(X.shape[0]) < 0.2
        uv = np.where(out[:, None], rng.uniform(0, 700, uv.shape), uv)
        key = jax.random.PRNGKey(0)
        R, t, inl, n = ransac.pnp_ransac(
            jnp.asarray(X, jnp.float32), jnp.asarray(uv, jnp.float32),
            jnp.ones((X.shape[0],), bool), cam, key,
        )
        assert int(n) > 0.7 * (~out).sum()
        rot_err = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(R) @ R_true.T) - 1) / 2, -1, 1)))
        assert rot_err < 0.1, rot_err
        assert np.linalg.norm(np.asarray(t) - t_true) < 0.05
