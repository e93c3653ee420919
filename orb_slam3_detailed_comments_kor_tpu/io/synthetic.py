"""Synthetic textured-world renderer with exact ground truth.

The reference has no automated tests (SURVEY.md §4); its verification is
dataset-driven.  Since CI cannot download EuRoC, we render controllable
synthetic sequences: a textured plane (or box corridor) ray-cast through the
camera model, giving images with dense FAST-able texture plus exact
poses/depths — the north-star for unit and integration tests, and the input
for `bench.py`.

Rendering is plain JAX (runs on TPU too): pixel → ray (camera model
unproject) → plane intersection → procedural texture lookup.  The texture is
a random lattice sampled with a blocky layer (strong corners for FAST) plus
a bilinear layer (smooth gradients for SAD subpixel).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.models import camera as cam
from orb_slam3_detailed_comments_kor_tpu.utils import lie

_LATTICE_N = 1024


def _texture_lattice(seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.rand(_LATTICE_N, _LATTICE_N).astype(np.float32)


# NOTE: kept as a NUMPY array on purpose: jitted closures over numpy become
# embedded compile-time constants (free), while closures over committed
# device arrays permanently degrade every later dispatch in the process to
# ~30 ms on the TPU runtime in use here (measured).
_LAT = _texture_lattice()


def _tex_nearest(x, y):
    lat = jnp.asarray(_LAT)  # numpy→traced constant (see note above)
    xi = jnp.mod(jnp.floor(x).astype(jnp.int32), _LATTICE_N)
    yi = jnp.mod(jnp.floor(y).astype(jnp.int32), _LATTICE_N)
    return lat[yi, xi]


def _tex_bilinear(x, y):
    lat = jnp.asarray(_LAT)  # numpy→traced constant (see note above)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi = jnp.mod(x0.astype(jnp.int32), _LATTICE_N)
    yi = jnp.mod(y0.astype(jnp.int32), _LATTICE_N)
    xi1 = jnp.mod(xi + 1, _LATTICE_N)
    yi1 = jnp.mod(yi + 1, _LATTICE_N)
    v00 = lat[yi, xi]
    v01 = lat[yi, xi1]
    v10 = lat[yi1, xi]
    v11 = lat[yi1, xi1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def texture(x, y, scale: float = 4.0):
    """Procedural texture over world metres -> intensity [0,255]."""
    blocky = _tex_nearest(x * scale, y * scale)
    fine = _tex_bilinear(x * scale * 7.3 + 11.0, y * scale * 7.3 + 5.0)
    coarse = _tex_bilinear(x * scale * 0.37, y * scale * 0.37)
    v = 0.55 * blocky + 0.25 * fine + 0.20 * coarse
    return v * 255.0


class Scene(NamedTuple):
    """A set of textured planes n_p·x = d_p bounding the world.

    A single fronto-parallel plane is DEGENERATE for BA (plane-induced
    rotation/translation ambiguity), so the default scene is a box room:
    front wall + floor + ceiling + side walls at different depths.
    """

    normals: jnp.ndarray  # [P,3] unit normals
    ds: jnp.ndarray       # [P]
    u_axes: jnp.ndarray   # [P,3] texture u direction (orthogonal to normal)
    v_axes: jnp.ndarray   # [P,3]
    offsets: jnp.ndarray  # [P,2] texture offset so planes look different


def default_scene() -> Scene:
    """Closed box room: walls z=5/z=−4, floor y=+1.5, ceiling y=−1.5,
    side walls x=±(4/2.5) — every heading sees texture."""
    return Scene(
        normals=jnp.array(
            [
                [0.0, 0.0, 1.0],   # front wall
                [0.0, 0.0, -1.0],  # back wall
                [0.0, 1.0, 0.0],   # floor
                [0.0, -1.0, 0.0],  # ceiling
                [1.0, 0.0, 0.0],   # right wall
                [-1.0, 0.0, 0.0],  # left wall
            ]
        ),
        ds=jnp.array([5.0, 4.0, 1.5, 1.5, 4.0, 2.5]),
        u_axes=jnp.array(
            [
                [1.0, 0.0, 0.0],
                [1.0, 0.0, 0.0],
                [1.0, 0.0, 0.0],
                [1.0, 0.0, 0.0],
                [0.0, 0.0, 1.0],
                [0.0, 0.0, 1.0],
            ]
        ),
        v_axes=jnp.array(
            [
                [0.0, 1.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
                [0.0, 0.0, 1.0],
                [0.0, 1.0, 0.0],
                [0.0, 1.0, 0.0],
            ]
        ),
        offsets=jnp.array(
            [[0.0, 0.0], [310.0, 95.0], [37.0, 11.0], [91.0, 53.0],
             [140.0, 7.0], [200.0, 170.0]]
        ),
    )


def corridor_scene() -> Scene:
    """Box room stretched along x (side walls at ±40): a long corridor so
    an out-and-back trajectory traverses metres of NON-repeating texture —
    keyframes from the far end share no content with the start, which is
    what forces capacity-pressure reclamation before the return leg closes
    the loop (the VERDICT r2 #1/#9 scenario)."""
    s = default_scene()
    return s._replace(ds=s.ds.at[4].set(40.0).at[5].set(40.0))


def wall_scene() -> Scene:
    """Single wall at z=5 (kept for targeted degenerate-geometry tests)."""
    s = default_scene()
    return Scene(
        normals=s.normals[:1], ds=s.ds[:1], u_axes=s.u_axes[:1],
        v_axes=s.v_axes[:1], offsets=s.offsets[:1],
    )


@functools.partial(jax.jit, static_argnames=("h", "w", "model"))
def render(
    params: jnp.ndarray,
    R_wc: jnp.ndarray,
    t_wc: jnp.ndarray,
    scene: Scene,
    h: int = 480,
    w: int = 752,
    model: str = "pinhole",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render image + depth map for camera-to-world pose (R_wc, t_wc).

    Nearest positive plane intersection per pixel; per-plane texture
    parametrized by (u_axis, v_axis) world coordinates.
    Returns (img [h,w] float32 0..255, depth [h,w] float32 along camera z).
    """
    _, unproject, _ = cam.make_camera(model)
    vv, uu = jnp.mgrid[0:h, 0:w]
    uv = jnp.stack([uu + 0.5, vv + 0.5], axis=-1).astype(jnp.float32)
    rays_c = unproject(params, uv.reshape(-1, 2))  # [hw,3] z=1
    rays_w = rays_c @ R_wc.T
    # per-plane: s_p = (d_p − n_p·t) / (n_p·ray)
    n_dot_ray = rays_w @ scene.normals.T                       # [hw,P]
    n_dot_t = scene.normals @ t_wc                             # [P]
    s_all = (scene.ds - n_dot_t)[None, :] / jnp.where(
        jnp.abs(n_dot_ray) < 1e-6, 1e-6, n_dot_ray
    )
    s_all = jnp.where(s_all > 0.05, s_all, jnp.inf)
    plane = jnp.argmin(s_all, axis=-1)                         # [hw]
    s = jnp.take_along_axis(s_all, plane[:, None], axis=-1)[:, 0]
    hit = jnp.isfinite(s)
    s_safe = jnp.where(hit, s, 1.0)
    pts_w = t_wc[None, :] + s_safe[:, None] * rays_w
    tu = jnp.sum(pts_w * scene.u_axes[plane], axis=-1) + scene.offsets[plane, 0]
    tv = jnp.sum(pts_w * scene.v_axes[plane], axis=-1) + scene.offsets[plane, 1]
    img = texture(tu, tv).reshape(h, w)
    depth = (s_safe * rays_c[:, 2]).reshape(h, w)
    hit = hit.reshape(h, w)
    img = jnp.where(hit, img, 0.0)
    depth = jnp.where(hit, depth, -1.0)
    return img, depth


def make_trajectory(
    n_frames: int,
    motion: str = "strafe",
    speed: float = 0.04,
) -> Tuple[np.ndarray, np.ndarray]:
    """Ground-truth camera-to-world poses (R_wc [T,3,3], t_wc [T,3]).

    'strafe': translate along +x facing the wall.
    'arc'   : translate + slow yaw, exercising rotation.
    'orbit' : loop trajectory (for loop-closing tests).
    """
    Rs, ts = [], []
    for i in range(n_frames):
        if motion == "strafe":
            R = np.eye(3)
            t = np.array([i * speed, 0.02 * np.sin(i * 0.2), 0.0])
        elif motion == "arc":
            yaw = 0.003 * i
            R = np.asarray(lie.so3_exp(jnp.array([0.0, yaw, 0.0])))
            t = np.array([i * speed, 0.0, 0.005 * i])
        elif motion == "outback":
            half = n_frames // 2
            x = speed * i if i < half else speed * (2 * half - i)
            R = np.eye(3)
            t = np.array([x, 0.015 * np.sin(i * 0.35), 0.0])
        elif motion == "spin":
            yaw = 2 * np.pi * i / n_frames
            R = np.asarray(lie.so3_exp(jnp.array([0.0, yaw, 0.0])))
            t = np.array([0.03 * np.sin(yaw), 0.01 * np.sin(3 * yaw), 0.03 - 0.03 * np.cos(yaw)])
        elif motion == "orbit":
            th = 2 * np.pi * i / n_frames
            r0 = 1.0
            R = np.asarray(lie.so3_exp(jnp.array([0.0, 0.15 * np.sin(th), 0.0])))
            t = np.array([r0 * np.sin(th), 0.0, r0 * (1 - np.cos(th)) * 0.3])
        else:
            raise ValueError(motion)
        Rs.append(R)
        ts.append(t)
    return np.stack(Rs).astype(np.float32), np.stack(ts).astype(np.float32)


class AnalyticTrajectory:
    """Smooth analytic camera/body trajectory with exact derivatives.

    Position and orientation are closed-form sinusoids; velocity, specific
    force and body rates come from jax autodiff, so the synthetic IMU is
    exact to float precision — the oracle for preintegration tests
    (SURVEY.md §4: 'preintegration vs tiny numerical integrator').
    World frame: x right, y down (gravity +y), z forward into the scene.
    """

    def __init__(self, scale: float = 1.0, gravity: float = 9.81, seed: int = 0,
                 excitation: float = 1.0):
        """excitation > 1 multiplies the translation frequencies (peak
        acceleration grows as excitation²): monocular-inertial scale is
        only observable when acceleration varies well above the visual
        noise floor — the same physical requirement that makes the
        reference demand 2 s of excited MAV motion before mono VI init
        (``LocalMapping.cc:1574-1607``)."""
        self.g_w = jnp.array([0.0, gravity, 0.0])
        a = scale
        f = excitation

        def pos(t):
            return jnp.stack(
                [
                    0.8 * a * jnp.sin(0.50 * f * t),
                    0.15 * a * jnp.sin(0.90 * f * t + 1.0),
                    0.40 * a * jnp.sin(0.40 * f * t + 0.3),
                ]
            )

        def rotvec(t):
            return jnp.stack(
                [
                    0.10 * jnp.sin(0.45 * t + 0.5),
                    0.25 * jnp.sin(0.30 * t),
                    0.05 * jnp.sin(0.70 * t + 1.2),
                ]
            )

        self._pos = pos
        self._rotvec = rotvec
        self._vel = jax.jacfwd(pos)
        self._acc = jax.jacfwd(self._vel)
        self._drot = jax.jacfwd(lambda t: lie.so3_exp(rotvec(t)))

    def pose(self, t):
        """(R_wb [3,3], p_wb [3]) body/camera-to-world."""
        return lie.so3_exp(self._rotvec(jnp.float32(t))), self._pos(jnp.float32(t))

    def velocity(self, t):
        return self._vel(jnp.float32(t))

    def imu_at(self, t):
        """(acc_body, gyro_body) ideal measurements at time t."""
        t = jnp.float32(t)
        R = lie.so3_exp(self._rotvec(t))
        a_w = self._acc(t)
        acc_b = R.T @ (a_w - self.g_w)   # specific force
        dR = self._drot(t)
        omega_b = lie.vee(R.T @ dR)
        return acc_b, omega_b

    def _rebind_pos(self, pos):
        """Swap the position law, rewiring autodiff derivatives (velocity,
        specific force) so the synthetic IMU stays exact."""
        self._pos = pos
        self._vel = jax.jacfwd(pos)
        self._acc = jax.jacfwd(self._vel)

    def imu_batch(self, t0: float, t1: float, rate: float, max_n: int,
                  noise_g: float = 0.0, noise_a: float = 0.0, key=None):
        """ImuBatch of measurements covering (t0, t1] at `rate` Hz, padded to
        max_n with invalid entries. Midpoint-sampled."""
        from orb_slam3_detailed_comments_kor_tpu.ops.imu import ImuBatch

        n = int(round((t1 - t0) * rate))
        n = min(n, max_n)
        dt = (t1 - t0) / max(n, 1)
        ts = t0 + (np.arange(max_n) + 0.5) * dt
        accs, gyros = jax.vmap(lambda tt: self.imu_at(tt))(jnp.asarray(ts, jnp.float32))
        if key is not None and (noise_g > 0 or noise_a > 0):
            k1, k2 = jax.random.split(key)
            gyros = gyros + noise_g * jnp.sqrt(rate) * jax.random.normal(k1, gyros.shape) / jnp.sqrt(rate) / jnp.sqrt(dt)
            accs = accs + noise_a * jax.random.normal(k2, accs.shape) / jnp.sqrt(dt)
        valid = jnp.arange(max_n) < n
        return ImuBatch(
            acc=accs, gyro=gyros,
            dt=jnp.where(valid, dt, 0.0), valid=valid,
        )


class CorridorTrajectory(AnalyticTrajectory):
    """Out-and-back corridor pass layered on the excited sinusoid base:
    x(t) += length · sin²(π·t / duration) — departs the start, reaches
    ``length`` metres of fresh texture at t = duration/2, and returns.
    Early keyframes leave covisibility on the way out (capacity pressure
    must reclaim slots from the middle of the corridor), and the return
    leg can only re-localize the drift through PLACE RECOGNITION against
    the protected start-anchor keyframes — the reclamation→loop-closure
    interaction scenario (VERDICT r2 #1/#9; reference
    ``LocalMapping.cc:1194`` keyframe culling vs ``LoopClosing`` anchors).
    """

    def __init__(self, length: float = 12.0, duration: float = 150.0, **kw):
        super().__init__(**kw)
        base_pos = self._pos
        ex = jnp.array([1.0, 0.0, 0.0])

        def pos(t):
            s = jnp.sin(jnp.pi * t / duration) ** 2
            return base_pos(t) + ex * (length * s)

        self._rebind_pos(pos)


def stereo_pair(
    params: jnp.ndarray,
    R_wc: jnp.ndarray,
    t_wc: jnp.ndarray,
    baseline: float,
    scene: PlaneScene,
    h: int = 480,
    w: int = 752,
    model: str = "pinhole",
):
    """Render a rectified stereo pair; right camera offset +baseline along
    the camera x-axis. Returns (imgL, imgR, depthL)."""
    imgL, depthL = render(params, R_wc, t_wc, scene, h, w, model)
    t_right = t_wc + R_wc @ jnp.array([baseline, 0.0, 0.0])
    imgR, _ = render(params, R_wc, t_right, scene, h, w, model)
    return imgL, imgR, depthL
