"""Camera models: pinhole (radial-tangential) and Kannala-Brandt8 fisheye.

TPU-native counterpart of the reference's ``GeometricCamera`` virtual
interface (``include/CameraModels/GeometricCamera.h:44-78``) with concrete
``Pinhole`` (``src/CameraModels/Pinhole.cpp``) and ``KannalaBrandt8``
(``src/CameraModels/KannalaBrandt8.cpp``) implementations.  Instead of a
virtual-dispatch class, each model is a set of pure batched functions over a
parameter vector, dispatched statically by config (camera model is fixed per
run, so there is no dynamic dispatch inside jit).

Conventions: 3-D points are in the camera frame, z forward.  ``params`` is
  pinhole:  [fx, fy, cx, cy]                (distortion handled separately —
            the pipeline rectifies/undistorts keypoints once at extraction,
            mirroring Frame::UndistortKeyPoints ``src/Frame.cc:733``)
  kb8:      [fx, fy, cx, cy, k0, k1, k2, k3] equidistant polynomial
            r(θ) = θ + k0·θ³ + k1·θ⁵ + k2·θ⁷ + k3·θ⁹
All functions broadcast over leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


# ---------------------------------------------------------------------------
# Pinhole
# ---------------------------------------------------------------------------

def pinhole_project(params, xyz):
    """Camera-frame points [...,3] -> pixels [...,2]. No distortion."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    z = jnp.maximum(xyz[..., 2], _EPS)
    u = fx * xyz[..., 0] / z + cx
    v = fy * xyz[..., 1] / z + cy
    return jnp.stack([u, v], axis=-1)


def pinhole_unproject(params, uv):
    """Pixels [...,2] -> unit-depth rays [...,3] (z=1)."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def pinhole_project_jac(params, xyz):
    """d(uv)/d(xyz): [...,2,3] analytic (GeometricCamera::projectJac analog)."""
    fx, fy = params[0], params[1]
    x, y = xyz[..., 0], xyz[..., 1]
    z = jnp.maximum(xyz[..., 2], _EPS)
    zi = 1.0 / z
    zi2 = zi * zi
    zeros = jnp.zeros_like(x)
    row0 = jnp.stack([fx * zi, zeros, -fx * x * zi2], axis=-1)
    row1 = jnp.stack([zeros, fy * zi, -fy * y * zi2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def distort_radtan(dist, xn):
    """Apply radial-tangential distortion to normalized coords [...,2].

    dist = (k1, k2, p1, p2[, k3]). Used by the synthetic renderer and by
    keypoint undistortion (iterative inverse).
    """
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    k3 = dist[4] if len(dist) > 4 else 0.0
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_radtan(dist, xd, iters: int = 8):
    """Iteratively invert distort_radtan (cv::undistortPoints equivalent)."""
    def body(_, xn):
        d = distort_radtan(dist, xn) - xn
        return xd - d

    return jax.lax.fori_loop(0, iters, body, xd)


# ---------------------------------------------------------------------------
# Kannala-Brandt 8 (equidistant fisheye) — KannalaBrandt8.cpp analog
# ---------------------------------------------------------------------------

def kb8_project(params, xyz):
    """Fisheye projection (KannalaBrandt8::project, KannalaBrandt8.cpp:46)."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k = params[4:8]
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    d = theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))))
    r_safe = jnp.maximum(r, _EPS)
    u = fx * d * x / r_safe + cx
    v = fy * d * y / r_safe + cy
    # at r=0 (optical axis) project to principal point
    on_axis = r < _EPS
    u = jnp.where(on_axis, cx, u)
    v = jnp.where(on_axis, cy, v)
    return jnp.stack([u, v], axis=-1)


def kb8_unproject(params, uv, iters: int = 10):
    """Iterative inverse of the equidistant polynomial via Newton iterations
    (KannalaBrandt8::unprojectEig, KannalaBrandt8.cpp:237-291), returning
    unit-depth rays [...,3]."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k = params[4:8]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    d = jnp.sqrt(mx * mx + my * my)  # distorted radius = r(θ)
    theta0 = d  # good init for small distortion

    def body(_, theta):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3])))) - d
        fp = 1.0 + t2 * (3 * k[0] + t2 * (5 * k[1] + t2 * (7 * k[2] + t2 * 9 * k[3])))
        return theta - f / jnp.maximum(fp, _EPS)

    theta = jax.lax.fori_loop(0, iters, body, theta0)
    scale = jnp.tan(theta) / jnp.maximum(d, _EPS)
    scale = jnp.where(d < _EPS, 1.0, scale)
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def kb8_project_jac(params, xyz):
    """Analytic-by-autodiff Jacobian [...,2,3] of kb8_project."""
    flat = xyz.reshape((-1, 3))
    J = jax.vmap(jax.jacfwd(lambda p: kb8_project(params, p)))(flat)
    return J.reshape(xyz.shape[:-1] + (2, 3))


# ---------------------------------------------------------------------------
# Static dispatch
# ---------------------------------------------------------------------------

def make_camera(model: str):
    """Return (project, unproject, project_jac) for a model name."""
    if model == "pinhole":
        return pinhole_project, pinhole_unproject, pinhole_project_jac
    if model == "kannala_brandt8":
        return kb8_project, kb8_unproject, kb8_project_jac
    raise ValueError(f"unknown camera model {model!r}")


def project(params, xyz, model: str = "pinhole"):
    """Statically-dispatched projection (GeometricCamera::project)."""
    return make_camera(model)[0](params, xyz)


def unproject(params, uv, model: str = "pinhole"):
    """Statically-dispatched unprojection to unit-depth rays."""
    return make_camera(model)[1](params, uv)


def project_jac(params, xyz, model: str = "pinhole"):
    """Statically-dispatched d(uv)/d(xyz) [...,2,3]."""
    return make_camera(model)[2](params, xyz)


def camera_params_from_config(cam) -> jnp.ndarray:
    """Build the params vector from a CameraConfig."""
    if cam.model == "pinhole":
        return jnp.array([cam.fx, cam.fy, cam.cx, cam.cy], dtype=jnp.float32)
    if cam.model == "kannala_brandt8":
        d = list(cam.dist[:4]) + [0.0] * max(0, 4 - len(cam.dist))
        return jnp.array(
            [cam.fx, cam.fy, cam.cx, cam.cy] + d[:4], dtype=jnp.float32
        )
    raise ValueError(cam.model)
