"""Reprojection factors: residuals + analytic Jacobians, batched.

TPU-native counterpart of the reference's g2o edge types
(``EdgeSE3ProjectXYZ`` / ``EdgeStereoSE3ProjectXYZ`` in
``include/OptimizableTypes.h:31-145`` and their ``linearizeOplus``): one
vectorized evaluation over a flat observation table instead of a graph of
edge objects.

Conventions:
- Poses are world-to-camera (R_cw, t_cw); update is left-multiplicative
  T_cw ← exp(ξ)·T_cw with ξ = (ρ, φ) (g2o SE3Quat::exp convention).
- Residual r = observed − predicted; Jacobians are ∂r/∂x (note the minus).
- Stereo observations carry u_right; residual row 2 is u_r − (u − bf/z)
  (reference EdgeStereo, ``G2oTypes.h:417-491``). Mono rows mask row 2.
- Whitening by √(inv_sigma2) (per-level σ² = scale^{2·level}) is applied by
  the solver, not here.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.models import camera
from orb_slam3_detailed_comments_kor_tpu.utils import lie

# chi2 gates at 95% for 2/3 DoF (reference Optimizer.cc:905-908)
CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class Observations(NamedTuple):
    """Flat observation table (the device-side 'edge list').

    ``cam`` marks which physical camera of a calibrated rig observed the
    row: 0 = left (default), 1 = right.  Right-camera rows are the analog
    of the reference's ToBody/right-camera mono edges
    (``include/OptimizableTypes.h:31-145``,
    ``EdgeSE3ProjectXYZToBody``): each is an independent 2-DoF mono
    reprojection residual through the rig extrinsic, exactly as the
    reference adds a second mono edge per stereo-fisheye match instead of
    a rectified u_r row.  ``cam=None`` (the default) means all-left and
    keeps every pinhole path byte-identical.
    """

    kf: jnp.ndarray          # [O] int32 keyframe index
    lm: jnp.ndarray          # [O] int32 landmark index
    uv: jnp.ndarray          # [O,2] float32 observed pixel (left cam)
    u_right: jnp.ndarray     # [O] float32 observed right-u; <0 → mono
    inv_sigma2: jnp.ndarray  # [O] float32 information scale (1/σ²)
    valid: jnp.ndarray       # [O] bool
    cam: Optional[jnp.ndarray] = None  # [O] int32 rig camera id (0/1)

    @property
    def n(self) -> int:
        return self.kf.shape[0]


def project_with_jac(cam_params, pc, bf, model: str = "pinhole"):
    """Projection of camera-frame points with stereo row, per camera model.

    pc [O,3] -> (pred [O,3] = (u,v,u_r), Jproj [O,3,3] = ∂pred/∂pc).
    For non-pinhole models the stereo row repeats the u row — fisheye
    observations are mono (u_right < 0 masks row 2), matching the
    reference where KannalaBrandt8 stereo goes through dedicated
    two-camera edges instead of the rectified u_r residual.
    """
    if model != "pinhole":
        uv = camera.project(cam_params, pc, model)
        Juv = camera.project_jac(cam_params, pc, model)
        pred = jnp.concatenate([uv, uv[..., :1]], axis=-1)
        J = jnp.concatenate([Juv, Juv[..., :1, :]], axis=-2)
        return pred, J
    fx, fy, cx, cy = cam_params[0], cam_params[1], cam_params[2], cam_params[3]
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-6)
    zi = 1.0 / z
    zi2 = zi * zi
    u = fx * x * zi + cx
    v = fy * y * zi + cy
    ur = u - bf * zi
    pred = jnp.stack([u, v, ur], axis=-1)
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([fx * zi, zero, -fx * x * zi2], axis=-1)
    row_v = jnp.stack([zero, fy * zi, -fy * y * zi2], axis=-1)
    row_r = jnp.stack([fx * zi, zero, -fx * x * zi2 + bf * zi2], axis=-1)
    J = jnp.stack([row_u, row_v, row_r], axis=-2)
    return pred, J


def with_rig_rows(obs: Observations, uvr_flat) -> Observations:
    """Append one right-camera row per left row (ToBody-edge expansion).

    uvr_flat [O,2]: matched right-camera pixel per left observation, x<0 =
    no match. Right rows inherit kf/lm/inv_sigma2; u_right is −1 (mono) and
    ``cam`` distinguishes the physical camera for ``_rig_select``.

    APPROXIMATION: the right row reuses the LEFT keypoint's octave weight
    (inv_sigma2), whereas the reference's ToBody edges weight by the right
    keypoint's own detected octave (``Optimizer.cc:1146`` region). At the
    rig baselines supported here the matched octaves differ by at most one
    level (the matcher enforces ±1 level slack), bounding the weight error
    to the 1.44× per-level sigma ratio.
    """
    n = obs.n
    return Observations(
        kf=jnp.tile(obs.kf, 2),
        lm=jnp.tile(obs.lm, 2),
        uv=jnp.concatenate([obs.uv, uvr_flat]),
        u_right=-jnp.ones((2 * n,), jnp.float32),
        inv_sigma2=jnp.tile(obs.inv_sigma2, 2),
        valid=jnp.concatenate([obs.valid, obs.valid & (uvr_flat[:, 0] >= 0)]),
        cam=jnp.concatenate(
            [jnp.zeros((n,), jnp.int32), jnp.ones((n,), jnp.int32)]
        ),
    )


def _rig_select(obs: Observations, pc, cam_params, bf, model, rig):
    """Per-row effective camera for a calibrated two-camera rig.

    pc [O,3] are LEFT-camera points. Returns (pred [O,3], Jproj [O,3,3] wrt
    the LEFT-camera point — the R_rl chain is already folded in — and
    z [O] of the effective camera). rig = (R_rl, t_rl, cam_params_r).
    """
    pred_l, J_l = project_with_jac(cam_params, pc, bf, model)
    if rig is None or obs.cam is None:
        return pred_l, J_l, pc[:, 2]
    R_rl, t_rl, params_r = rig
    pc_r = pc @ R_rl.T + t_rl
    pred_r, J_r = project_with_jac(params_r, pc_r, bf, model)
    # chain ∂pc_r/∂pc_l = R_rl into the right-camera projection Jacobian
    J_r = jnp.einsum("oij,jk->oik", J_r, R_rl)
    is_r = (obs.cam == 1)[:, None]
    pred = jnp.where(is_r, pred_r, pred_l)
    J = jnp.where(is_r[:, :, None], J_r, J_l)
    z = jnp.where(is_r[:, 0], pc_r[:, 2], pc[:, 2])
    return pred, J, z


def reproj_residuals(
    R_cw, t_cw, X, obs: Observations, cam_params, bf, model: str = "pinhole",
    rig=None,
):
    """Residuals + per-row validity.

    R_cw [K,3,3], t_cw [K,3], X [L,3].
    Returns (r [O,3], row_mask [O,3] float, depth_ok [O] bool).
    rig = (R_rl, t_rl, cam_params_r) enables right-camera rows (obs.cam==1).
    """
    Rk = R_cw[obs.kf]
    tk = t_cw[obs.kf]
    Xo = X[obs.lm]
    pc = jnp.einsum("oij,oj->oi", Rk, Xo) + tk
    pred, _, z_eff = _rig_select(obs, pc, cam_params, bf, model, rig)
    observed = jnp.concatenate([obs.uv, obs.u_right[:, None]], axis=-1)
    r = observed - pred
    is_stereo = obs.u_right >= 0
    row_mask = jnp.stack(
        [
            jnp.ones_like(is_stereo, jnp.float32),
            jnp.ones_like(is_stereo, jnp.float32),
            is_stereo.astype(jnp.float32),
        ],
        axis=-1,
    ) * obs.valid[:, None]
    depth_ok = z_eff > 1e-3
    r = r * row_mask
    return r, row_mask, depth_ok


def reproj_jacobians(R_cw, t_cw, X, obs: Observations, cam_params, bf,
                     model: str = "pinhole", rig=None):
    """∂r/∂pose [O,3,6] (ξ=(ρ,φ) left-mult on T_cw) and ∂r/∂X [O,3,3]."""
    Rk = R_cw[obs.kf]
    tk = t_cw[obs.kf]
    Xo = X[obs.lm]
    pc = jnp.einsum("oij,oj->oi", Rk, Xo) + tk
    _, Jproj, _ = _rig_select(obs, pc, cam_params, bf, model, rig)
    # ∂pc/∂ξ = [I | −hat(pc)]; ∂r/∂· = −Jproj @ ∂pc/∂·
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))
    dpc_dxi = jnp.concatenate([eye, -lie.hat(pc)], axis=-1)  # [O,3,6]
    J_pose = -jnp.einsum("oij,ojk->oik", Jproj, dpc_dxi)
    J_point = -jnp.einsum("oij,ojk->oik", Jproj, Rk)
    return J_pose, J_point


def huber_weight(chi2, delta2):
    """IRLS weight for the Huber kernel on squared error.

    w = 1 if chi2 <= delta2 else delta/sqrt(chi2)  (g2o robust_kernel_impl).
    """
    return jnp.where(
        chi2 <= delta2,
        1.0,
        jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)),
    )
