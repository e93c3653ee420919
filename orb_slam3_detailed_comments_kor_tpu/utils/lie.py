"""SO(3) / SE(3) / Sim(3) Lie-group operations in JAX.

TPU-native replacement for the reference's scattered Lie machinery:
``ImuTypes.h:270-279`` (ExpSO3/LogSO3/right Jacobians), g2o's
``se3quat.h`` / ``sim3.h`` (``Thirdparty/g2o/g2o/types/``), and the
``Converter`` glue (``src/Converter.cc``).  Everything is pure-functional,
batched via vmap, and uses Taylor-safe small-angle branches expressed with
``jnp.where`` so gradients stay finite under jit.

Conventions: rotations are 3x3 matrices; SE(3) is (R, t) acting as
x_w -> R @ x + t; transforms named ``T_ab`` map b-frame points to a-frame.
Poses are stored as (R: [...,3,3], t: [...,3]) pairs — no quaternions on the
hot path (matmuls are free on TPU; normalization is a projection to the
nearest rotation every K updates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8



def _safe_norm(w):
    """Norm that is autodiff-safe at w=0 (where d|w|/dw is 0/0).

    Returns (theta, theta_is_small); the sqrt sees a masked operand so its
    tangent never produces NaN in the untaken branch.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    return jnp.where(small, 0.0, theta), small

def hat(w):
    """so(3) hat: [...,3] -> [...,3,3] skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: [...,3,3] -> [...,3]."""
    return jnp.stack(
        [W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1
    )


def _sinc(x):
    """sin(x)/x, Taylor-safe."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)  # avoid 0/0 in the non-taken branch
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(xs) / xs)


def _cosc(x):
    """(1-cos(x))/x^2, Taylor-safe."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)
    return jnp.where(small, 0.5 - x * x / 24.0, (1.0 - jnp.cos(xs)) / (xs * xs))


def _sincc(x):
    """(x - sin(x))/x^3, Taylor-safe."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)
    return jnp.where(
        small, 1.0 / 6.0 - x * x / 120.0, (xs - jnp.sin(xs)) / (xs ** 3)
    )


def so3_exp(w):
    """Exponential map so(3) -> SO(3). w: [...,3] -> [...,3,3].

    Rodrigues: R = I + sinc(θ)·W + cosc(θ)·W². Autodiff-safe at w=0.
    """
    theta, _ = _safe_norm(w)
    W = hat(w)
    W2 = W @ W
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R):
    """Log map SO(3) -> so(3). [...,3,3] -> [...,3].

    Uses the trace formula with a Taylor-safe θ/sin(θ) factor; near π the
    axis is recovered from the diagonal of (R + Rᵀ)/2 (reference semantics:
    ``ImuTypes.cc`` LogSO3).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    w_skew = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(θ)·axis
    # arccos' = −1/√(1−x²) is ∞ at x=±1, which poisons autodiff even in the
    # untaken branch — mask the arccos operand away from ±1 and use the
    # first-order value w_skew directly for θ≈0.
    tiny = cos_t > 1.0 - 1e-6
    cos_safe = jnp.clip(jnp.where(tiny, 0.0, cos_t), -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.where(tiny, 0.0, jnp.arccos(cos_safe))
    # generic branch: θ/sinθ * w_skew
    sin_t = _sinc(theta)  # sin(θ)/θ
    generic = jnp.where(
        tiny[..., None], w_skew, w_skew / jnp.maximum(sin_t, _EPS)[..., None]
    )
    # near-π branch: |w_i| = θ·sqrt((R_ii+1)/2), sign from w_skew (or +)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.maximum((diag + 1.0) * 0.5, 0.0))
    # disambiguate signs using the off-diagonal sums: for θ≈π,
    # R+Rᵀ = 2(I + (2/θ²)·w wᵀ) - ... actually (R+Rᵀ)/2 - cosθ I = (1-cosθ) aaᵀ
    # so off-diagonals give sign products; anchor sign on largest component.
    S = (R + jnp.swapaxes(R, -1, -2)) * 0.5
    i_max = jnp.argmax(axis_abs, axis=-1)

    def _signs(S, axis_abs, i_max):
        col = S[:, i_max]  # [3] column through the largest axis comp
        s = jnp.where(col < 0, -1.0, 1.0)
        s = s * s[i_max]  # make the anchor positive
        return axis_abs * s

    signs = _signs if R.ndim == 2 else jax.vmap(_signs)
    # handle arbitrary batch dims by flattening
    batch_shape = R.shape[:-2]
    Sf = S.reshape((-1, 3, 3))
    af = axis_abs.reshape((-1, 3))
    imf = i_max.reshape((-1,))
    near_pi_axis = jax.vmap(_signs)(Sf, af, imf).reshape(batch_shape + (3,))
    near_pi = theta[..., None] * near_pi_axis
    use_pi = (theta > 3.0)[..., None]
    return jnp.where(use_pi, near_pi, generic)


def so3_left_jacobian(w):
    """Left Jacobian J_l of SO(3): [...,3] -> [...,3,3].

    J_l = I + cosc(θ)·W + sincc(θ)·W².
    """
    theta, _ = _safe_norm(w)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + _cosc(theta)[..., None, None] * W + _sincc(theta)[..., None, None] * W2


def so3_right_jacobian(w):
    """Right Jacobian J_r(w) = J_l(-w) (reference ``ImuTypes.h:276`` RightJacobianSO3)."""
    return so3_left_jacobian(-w)


def so3_right_jacobian_inv(w):
    """Inverse right Jacobian, Taylor-safe (reference InverseRightJacobianSO3)."""
    theta, _ = _safe_norm(w)
    W = hat(w)
    W2 = W @ W
    small = theta < 1e-4
    ts = jnp.where(small, 1.0, theta)
    # coefficient of W2: (1/θ² - (1+cosθ)/(2 θ sinθ))
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta * theta / 720.0,
        1.0 / (ts * ts) - (1.0 + jnp.cos(ts)) / (2.0 * ts * jnp.sin(ts)),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + coef[..., None, None] * W2


def project_to_so3(R):
    """Project a near-rotation matrix to SO(3) via SVD (gauge cleanup)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )
    return (U * D[..., None, :]) @ Vt


# ---------------------------------------------------------------------------
# SE(3): pose = (R [...,3,3], t [...,3])
# ---------------------------------------------------------------------------

def se3_exp(xi):
    """exp: [...,6] (rho, phi) -> (R, t). t = J_l(phi) @ rho."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(phi), rho)
    return R, t


def se3_log(R, t):
    """log: (R, t) -> [...,6] (rho, phi)."""
    phi = so3_log(R)
    Jl_inv = so3_right_jacobian_inv(-phi)  # J_l(phi)^{-1} = J_r(-phi)^{-1}
    rho = jnp.einsum("...ij,...j->...i", Jl_inv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_compose(Ra, ta, Rb, tb):
    """T_a ∘ T_b = (Ra Rb, Ra tb + ta)."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R, t, x):
    """Apply transform to points x: [...,3]."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


# Jitted host-side helpers: on a remote-tunnel runtime every eager jnp op
# is its own ~0.8 ms dispatch, so host pose bookkeeping (keyframe save/
# restore, loop re-basing) uses these single-dispatch forms.
se3_compose_j = jax.jit(se3_compose)


@jax.jit
def se3_rel(Ra, ta, Rb, tb):
    """T_a ∘ T_b⁻¹ in one dispatch."""
    Ri, ti = se3_inverse(Rb, tb)
    return se3_compose(Ra, ta, Ri, ti)


# ---------------------------------------------------------------------------
# Sim(3): (R, t, s) with action x -> s·R·x + t  (g2o sim3.h semantics)
# ---------------------------------------------------------------------------

def sim3_apply(R, t, s, x):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


def sim3_inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), s_inv


def sim3_compose(Ra, ta, sa, Rb, tb, sb):
    """S_a ∘ S_b: (Ra Rb, sa·Ra·tb + ta, sa·sb)."""
    return (
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
        sa * sb,
    )


def sim3_exp(xi):
    """Sim(3) exp: [...,7] (rho, phi, sigma) -> (R, t, s).

    Implements the closed-form W matrix (Ethan Eade's notes); used by the
    essential-graph optimizer in place of g2o's ``sim3.h``.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    theta, _ = _safe_norm(phi)
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    W = hat(phi)
    W2 = W @ W
    # coefficients A,B,C of W-matrix: V = A I + B W + C W^2 with
    # A = (s-1)/sigma, etc. — all Taylor-safe.
    sig_small = jnp.abs(sigma) < 1e-5
    sig_s = jnp.where(sig_small, 1.0, sigma)
    A = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / sig_s)

    th_small = theta < 1e-5
    th_s = jnp.where(th_small, 1.0, theta)
    sig2_th2 = sigma * sigma + theta * theta
    denom = jnp.where(jnp.abs(sig2_th2) < 1e-12, 1.0, sig2_th2)

    # B = (sigma*(s*sinθ... full Eade formula
    sin_t = jnp.sin(th_s)
    cos_t = jnp.cos(th_s)
    a_coef = s * sin_t
    b_coef = s * cos_t
    # generic:
    B_gen = (a_coef * sigma + (1.0 - b_coef) * th_s) / (th_s * denom)
    C_gen = (
        A - ((b_coef - 1.0) * sigma + a_coef * th_s) / denom
    ) / (th_s * th_s)
    # θ->0 limits: B -> (sigma*s*θ... lim B = (σ(s·θ)+ (1-s)·θ)/(θ d) ->
    # use series: B ≈ 1/2 + sigma/6, C ≈ 1/6 + sigma/24 (at sigma->0 matches SE3)
    B_small = 0.5 + sigma / 6.0
    C_small = 1.0 / 6.0 + sigma / 24.0
    B = jnp.where(th_small, B_small, B_gen)
    C = jnp.where(th_small, C_small, C_gen)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t, s


def sim3_log(R, t, s):
    """Sim(3) log -> [...,7]. Inverse of sim3_exp (V solved numerically)."""
    phi = so3_log(R)
    sigma = jnp.log(s)
    # Rebuild V from (phi, sigma) exactly as in sim3_exp, then solve V rho = t.
    xi_rot = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1)
    # reuse coefficient computation by calling sim3_exp on a dummy rho of e_i
    # cheaper: recompute V directly
    theta = jnp.linalg.norm(phi, axis=-1)
    W = hat(phi)
    W2 = W @ W
    sig_small = jnp.abs(sigma) < 1e-5
    sig_s = jnp.where(sig_small, 1.0, sigma)
    A = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / sig_s)
    th_small = theta < 1e-5
    th_s = jnp.where(th_small, 1.0, theta)
    sig2_th2 = sigma * sigma + theta * theta
    denom = jnp.where(jnp.abs(sig2_th2) < 1e-12, 1.0, sig2_th2)
    sin_t = jnp.sin(th_s)
    cos_t = jnp.cos(th_s)
    a_coef = s * sin_t
    b_coef = s * cos_t
    B_gen = (a_coef * sigma + (1.0 - b_coef) * th_s) / (th_s * denom)
    C_gen = (A - ((b_coef - 1.0) * sigma + a_coef * th_s) / denom) / (th_s * th_s)
    B = jnp.where(th_small, 0.5 + sigma / 6.0, B_gen)
    C = jnp.where(th_small, 1.0 / 6.0 + sigma / 24.0, C_gen)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    V = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * W2
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Quaternion helpers (trajectory IO uses qw qx qy qz — EuRoC/TUM formats)
# ---------------------------------------------------------------------------

def rotmat_to_quat(R):
    """[...,3,3] -> [...,4] (w,x,y,z), Shepperd's method (branchless blend)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick the numerically best
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q):
    """[...,4] (w,x,y,z) -> [...,3,3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
