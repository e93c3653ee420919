"""Dataset drivers + native host runtime tests.

Covers: OpenCV-YAML settings parsing (Tracking::ParseCamParamFile analog),
rectification maps (initUndistortRectifyMap analog), native PNG/PGM decode
vs PIL, native remap vs numpy remap, and the prefetch feeder's ordering.
"""

import os

import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu import config as cfgm
from orb_slam3_detailed_comments_kor_tpu.io import datasets as ds

EUROC_YAML = """%YAML:1.0
# test settings mirroring Examples/Stereo-Inertial/EuRoC.yaml
Camera.type: "PinHole"
Camera.fx: 435.2046959714599
Camera.fy: 435.2046959714599
Camera.cx: 367.4517211914062
Camera.cy: 252.2008514404297
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
Camera.bf: 47.90639384423901
Camera.RGB: 1
ThDepth: 35.0
Tbc: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
LEFT.height: 480
LEFT.width: 752
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2046959714599, 0, 367.4517211914062, 0, 0, 435.2046959714599,
        252.2008514404297, 0, 0, 0, 1, 0]
RIGHT.height: 480
RIGHT.width: 752
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1.0]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2046959714599, 0, 367.4517211914062, -47.90639384423901, 0,
        435.2046959714599, 252.2008514404297, 0, 0, 0, 1, 0]
"""


@pytest.fixture(scope="module")
def yaml_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("settings") / "EuRoC.yaml"
    p.write_text(EUROC_YAML)
    return str(p)


class TestSettings:
    def test_parse(self, yaml_path):
        s = ds.load_settings(yaml_path, cfgm.SensorType.IMU_STEREO)
        cfg = s.config
        assert cfg.camera.width == 752
        assert abs(cfg.camera.fx - 435.2046959714599) < 1e-9
        assert abs(cfg.camera.bf - 47.90639384423901) < 1e-9
        assert cfg.orb.n_features == 1200
        assert cfg.orb.n_levels == 8
        assert abs(cfg.imu.noise_gyro - 1.7e-4) < 1e-12
        assert abs(cfg.imu.frequency - 200.0) < 1e-9
        tbc = np.asarray(cfg.imu.tbc).reshape(4, 4)
        assert abs(tbc[0, 1] + 0.999880929698) < 1e-9
        assert s.rectify is not None
        assert s.rectify.k_l.shape == (3, 3)
        assert s.rectify.p_r[0, 3] == pytest.approx(-47.90639384423901)

    def test_identity_rectification_map(self):
        k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        p = np.hstack([k, np.zeros((3, 1))])
        mx, my = ds.undistort_rectify_map(
            k, np.zeros(5), np.eye(3), p, 64, 48
        )
        u, v = np.meshgrid(np.arange(64), np.arange(48))
        np.testing.assert_allclose(mx, u, atol=1e-4)
        np.testing.assert_allclose(my, v, atol=1e-4)

    def test_remap_identity(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
        u, v = np.meshgrid(
            np.arange(64, dtype=np.float32), np.arange(48, dtype=np.float32)
        )
        out = ds.remap_bilinear(img, u, v)
        np.testing.assert_allclose(out, img, atol=1e-3)


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8), mode="L").save(path)


@pytest.fixture(scope="module")
def euroc_dir(tmp_path_factory):
    """Tiny synthetic EuRoC-layout sequence: 5 stereo frames + IMU."""
    root = tmp_path_factory.mktemp("euroc_seq")
    rng = np.random.default_rng(1)
    for cam in ("cam0", "cam1"):
        d = root / "mav0" / cam / "data"
        d.mkdir(parents=True)
        lines = ["#timestamp [ns],filename"]
        for i in range(5):
            tn = 1403636579763555584 + i * 50_000_000
            name = f"{tn}.png"
            _write_png(str(d / name), rng.uniform(0, 255, (48, 64)))
            lines.append(f"{tn},{name}")
        (root / "mav0" / cam / "data.csv").write_text("\n".join(lines))
    imu_dir = root / "mav0" / "imu0"
    imu_dir.mkdir(parents=True)
    rows = ["#timestamp,wx,wy,wz,ax,ay,az"]
    t0 = 1403636579763555584 - 10_000_000
    for i in range(60):
        tn = t0 + i * 5_000_000  # 200 Hz
        rows.append(f"{tn},0.01,0.02,-0.01,0.1,-9.8,0.2")
    (imu_dir / "data.csv").write_text("\n".join(rows))
    return str(root)


class TestEurocLoader:
    def test_frames_and_imu(self, euroc_dir):
        seq = ds.EurocSequence(euroc_dir)
        assert len(seq) == 5
        f0 = seq[0]
        assert f0.right is not None
        img = ds.load_gray(f0.left)
        assert img.shape == (48, 64)
        assert img.dtype == np.float32
        t, g, a = seq.imu.between(seq[0].t, seq[1].t)
        assert len(t) == 10  # 50ms at 200Hz
        assert np.all(t > seq[0].t) and np.all(t <= seq[1].t)

    def test_timestamp_filter(self, euroc_dir, tmp_path):
        seq_all = ds.EurocSequence(euroc_dir)
        tfile = tmp_path / "stamps.txt"
        keep = [f.t_ns for f in seq_all.frames[1:3]]
        tfile.write_text("\n".join(str(k) for k in keep))
        seq = ds.EurocSequence(euroc_dir, timestamps=str(tfile))
        assert len(seq) == 2


class TestTumRgbd:
    def test_association(self, tmp_path):
        root = tmp_path / "tum"
        (root / "rgb").mkdir(parents=True)
        (root / "depth").mkdir(parents=True)
        rng = np.random.default_rng(2)
        rgb_lines, dep_lines = ["# rgb"], ["# depth"]
        for i in range(4):
            t = 100.0 + i * 0.05
            rn, dn = f"rgb/{t:.6f}.png", f"depth/{t + 0.004:.6f}.png"
            _write_png(str(root / rn), rng.uniform(0, 255, (32, 40)))
            _write_png(str(root / dn), rng.uniform(0, 255, (32, 40)))
            rgb_lines.append(f"{t:.6f} {rn}")
            dep_lines.append(f"{t + 0.004:.6f} {dn}")
        (root / "rgb.txt").write_text("\n".join(rgb_lines))
        (root / "depth.txt").write_text("\n".join(dep_lines))
        seq = ds.TumRgbdSequence(str(root))
        assert len(seq) == 4
        assert seq[0].depth is not None


class TestNative:
    @pytest.fixture(scope="class")
    def nat(self):
        try:
            from orb_slam3_detailed_comments_kor_tpu.io import native_host

            return native_host.load()
        except Exception as e:
            pytest.skip(f"native toolchain unavailable: {e}")

    def test_decode_matches_pil(self, nat, tmp_path):
        rng = np.random.default_rng(3)
        arr = rng.uniform(0, 255, (40, 56)).astype(np.uint8)
        p = str(tmp_path / "x.png")
        _write_png(p, arr)
        out = nat.load_gray(p)
        np.testing.assert_allclose(out, arr.astype(np.float32), atol=0.5)

    def test_decode_pgm(self, nat, tmp_path):
        rng = np.random.default_rng(4)
        arr = rng.uniform(0, 255, (30, 44)).astype(np.uint8)
        p = str(tmp_path / "x.pgm")
        with open(p, "wb") as f:
            f.write(b"P5\n44 30\n255\n")
            f.write(arr.tobytes())
        out = nat.load_gray(p)
        np.testing.assert_allclose(out, arr.astype(np.float32), atol=0.01)

    def test_remap_matches_numpy(self, nat):
        rng = np.random.default_rng(5)
        img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
        mx = rng.uniform(0, 63, (48, 64)).astype(np.float32)
        my = rng.uniform(0, 47, (48, 64)).astype(np.float32)
        a = nat.remap_bilinear(img, mx, my)
        b = ds.remap_bilinear(img, mx, my)
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_feeder_order(self, nat, euroc_dir):
        from orb_slam3_detailed_comments_kor_tpu.io import native_host

        seq = ds.EurocSequence(euroc_dir)
        lefts = [f.left for f in seq.frames]
        rights = [f.right for f in seq.frames]
        feeder = native_host.StereoFeeder(lefts, rights, 48, 64, depth=3,
                                          workers=2)
        got = list(feeder)
        assert len(got) == len(seq)
        for (l, r), ref in zip(got, seq.frames):
            np.testing.assert_allclose(l, ds.load_gray(ref.left), atol=0.5)
            np.testing.assert_allclose(r, ds.load_gray(ref.right), atol=0.5)
