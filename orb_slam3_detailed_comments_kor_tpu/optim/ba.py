"""Levenberg-Marquardt bundle adjustment with Schur-complement elimination.

This module replaces the reference's entire g2o stack for the visual paths:
``Optimizer::PoseOptimization`` (``src/Optimizer.cc:831-1146``),
``Optimizer::LocalBundleAdjustment`` (``Optimizer.cc:1637``) and
``Optimizer::BundleAdjustment`` / GBA (``Optimizer.cc:62``), plus g2o's
``block_solver.hpp`` Schur machinery (``Thirdparty/g2o/g2o/core/``).

TPU-first design decisions:
- All state is SoA device arrays with static capacities + masks; the
  "graph" is the flat Observations table.
- The landmark-block Hessian (3x3 per landmark) is inverted in closed form;
  the camera-camera reduced system S (6K x 6K dense) is formed by one
  scatter + two einsum contractions per landmark chunk and solved with a
  dense Cholesky.  For local BA (K≤32) this is a single ~200x200 solve —
  far below MXU granularity, so the whole LM iteration fuses into one
  device program with zero host round-trips.
- Robustification is IRLS Huber weights (g2o's robust kernel as weights).
- The LM loop is a lax.scan with branchless accept/reject, so a full
  optimization is ONE jit-compiled kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.optim import factors
from orb_slam3_detailed_comments_kor_tpu.optim.factors import (
    CHI2_MONO,
    CHI2_STEREO,
    Observations,
)
from orb_slam3_detailed_comments_kor_tpu.utils import lie


def _robust_cost(chi2, delta2):
    """Huber rho applied to squared error (for accept/reject decisions)."""
    return jnp.where(
        chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2
    )


def _eval_weights(r, obs, use_huber):
    """Whitened chi2 + total IRLS weight per observation."""
    chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    delta2 = jnp.where(obs.u_right >= 0, CHI2_STEREO, CHI2_MONO)
    w_huber = jnp.where(use_huber, factors.huber_weight(chi2, delta2), 1.0)
    return chi2, w_huber, delta2


# ---------------------------------------------------------------------------
# Motion-only pose optimization (PoseOptimization analog)
# ---------------------------------------------------------------------------

class PoseOptResult(NamedTuple):
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    inlier: jnp.ndarray  # [O] bool final inlier set
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("rounds", "iters", "cam_model"))
def pose_optimization(
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    u_right: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    cam_params: jnp.ndarray,
    bf: float,
    rounds: int = 4,
    iters: int = 10,
    prior=None,
    cam_model: str = "pinhole",
    uv_r=None,
    rig=None,
) -> PoseOptResult:
    """Motion-only BA: optimize one pose against fixed 3-D points.

    Mirrors the reference's 4 rounds x 10 LM iterations with chi² inlier
    re-gating between rounds and the robust kernel dropped after round 2
    (``Optimizer.cc:831-1146``).  X [N,3] are matched map points for each
    observation (already gathered), uv/u_right/inv_sigma2/valid are [N].

    prior: optional (R_p, t_p, info_R, info_t) — a whitened 6-DoF pose
    prior pulling toward an IMU-predicted pose: the single-dispatch
    equivalent of fusing the preintegration factor into per-frame tracking
    (``Optimizer::PoseInertialOptimizationLastKeyFrame``,
    ``Optimizer.cc:6697`` — there the full 15-D state is optimized; here
    velocity/bias stay at their predicted values and only the pose feels
    the inertial pull, which is what damps visual jitter).

    uv_r [N,2] + rig=(R_rl, t_rl, cam_params_r): rig right-camera pixels
    per observation (x<0 = none) — each becomes an independent mono
    residual through the rig extrinsic (reference
    ``EdgeSE3ProjectXYZOnlyPoseToBody``, ``OptimizableTypes.h:94-118``).
    """
    n = X.shape[0]
    obs = Observations(
        kf=jnp.zeros((n,), jnp.int32),
        lm=jnp.arange(n, dtype=jnp.int32),
        uv=uv,
        u_right=u_right,
        inv_sigma2=inv_sigma2,
        valid=valid,
    )
    if rig is not None:
        assert uv_r is not None, "rig pose optimization requires uv_r"
        obs = factors.with_rig_rows(obs, uv_r)
        valid = obs.valid
    delta2 = jnp.where(obs.u_right >= 0, CHI2_STEREO, CHI2_MONO)

    def residual(R, t, active):
        r, row_mask, depth_ok = factors.reproj_residuals(
            R[None], t[None], X, obs._replace(valid=active), cam_params, bf,
            cam_model, rig=rig,
        )
        return r, row_mask, depth_ok

    def prior_cost(R, t):
        if prior is None:
            return jnp.float32(0.0)
        R_p, t_p, info_R, info_t = prior
        r_R = lie.so3_log(R @ R_p.T)
        r_t = t - t_p
        return info_R * jnp.sum(r_R**2) + info_t * jnp.sum(r_t**2)

    def prior_terms(R, t):
        """(H_prior [6,6], b_prior [6]) for left-mult se3 update [θ, t]."""
        R_p, t_p, info_R, info_t = prior
        r_R = lie.so3_log(R @ R_p.T)   # ∂/∂θ ≈ I
        r_t = t - t_p                  # ∂/∂θ = −[t]×, ∂/∂δt = I
        tx = lie.hat(t)
        H = jnp.zeros((6, 6))
        H = H.at[:3, :3].set(info_R * jnp.eye(3) + info_t * (tx.T @ tx))
        H = H.at[:3, 3:].set(-info_t * tx.T)
        H = H.at[3:, :3].set(-info_t * tx)
        H = H.at[3:, 3:].set(info_t * jnp.eye(3))
        b = jnp.concatenate([
            -info_R * r_R + info_t * (tx.T @ r_t),
            -info_t * r_t,
        ])
        return H, b

    def lm_round(carry, round_idx):
        R, t, inlier = carry
        use_huber = round_idx < 2

        def lm_iter(c, _):
            R, t, lam, best_cost = c
            active = inlier & valid
            r, row_mask, depth_ok = residual(R, t, active)
            active = active & depth_ok
            chi2, w_h, _ = _eval_weights(r, obs, use_huber)
            w = obs.inv_sigma2 * w_h * active
            Jp, _ = factors.reproj_jacobians(
                R[None], t[None], X, obs, cam_params, bf, cam_model, rig=rig
            )
            Jp = Jp * row_mask[:, :, None]
            H = jnp.einsum("oij,oik,o->jk", Jp, Jp, w)
            b = -jnp.einsum("oij,oi,o->j", Jp, r, w)
            if prior is not None:
                H_pr, b_pr = prior_terms(R, t)
                H = H + H_pr
                b = b + b_pr
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
            delta = jnp.linalg.solve(Hd, b)
            dR, dt = lie.se3_exp(delta)
            R_new = dR @ R
            t_new = dR @ t + dt
            r2, _, dok2 = residual(R_new, t_new, active)
            chi2_new = jnp.sum(r2 * r2, axis=-1) * obs.inv_sigma2
            cost_new = jnp.sum(
                jnp.where(use_huber, _robust_cost(chi2_new, delta2), chi2_new)
                * (active & dok2)
            ) + prior_cost(R_new, t_new)
            accept = cost_new < best_cost
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            lam = jnp.where(accept, lam * 0.33, lam * 3.0)
            best_cost = jnp.where(accept, cost_new, best_cost)
            return (R, t, lam, best_cost), None

        # initial cost for this round
        r0, _, dok0 = residual(R, t, inlier & valid)
        chi2_0, _, _ = _eval_weights(r0, obs, use_huber)
        cost0 = jnp.sum(
            jnp.where(use_huber, _robust_cost(chi2_0, delta2), chi2_0)
            * (inlier & valid & dok0)
        ) + prior_cost(R, t)
        (R, t, _, _), _ = jax.lax.scan(
            lm_iter, (R, t, jnp.float32(1e-3), cost0), None, length=iters
        )
        # re-gate inliers on the FULL observation set (outliers can recover)
        r1, _, dok1 = residual(R, t, valid)
        chi2_1 = jnp.sum(r1 * r1, axis=-1) * obs.inv_sigma2
        inlier = (chi2_1 <= delta2) & valid & dok1
        return (R, t, inlier), None

    inlier0 = valid
    (R, t, inlier), _ = jax.lax.scan(
        lm_round, (R_cw, t_cw, inlier0), jnp.arange(rounds)
    )
    R = lie.project_to_so3(R)
    if rig is not None:
        # report LEFT-camera inliers only: callers' min-inlier thresholds
        # and per-landmark bookkeeping are defined on left-frame features
        inlier = inlier[:n]
    return PoseOptResult(R, t, inlier, jnp.sum(inlier))


# ---------------------------------------------------------------------------
# Full BA with Schur elimination (LocalBundleAdjustment / GBA analog)
# ---------------------------------------------------------------------------

class BAResult(NamedTuple):
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    X: jnp.ndarray
    chi2: jnp.ndarray      # final per-obs chi2
    inlier: jnp.ndarray    # [O] chi2-gate at the end


def _build_normal_blocks(R_cw, t_cw, X, obs, cam_params, bf, w_total, row_mask,
                         cam_model="pinhole", rig=None):
    """Per-obs Jacobian blocks + scatter-accumulated Hpp/Hll/b."""
    K = R_cw.shape[0]
    L = X.shape[0]
    Jp, Jl = factors.reproj_jacobians(R_cw, t_cw, X, obs, cam_params, bf,
                                      cam_model, rig=rig)
    Jp = Jp * row_mask[:, :, None]
    Jl = Jl * row_mask[:, :, None]
    r, _, _ = factors.reproj_residuals(R_cw, t_cw, X, obs, cam_params, bf,
                                       cam_model, rig=rig)
    Hpp = jnp.zeros((K, 6, 6)).at[obs.kf].add(
        w_total[:, None, None] * jnp.einsum("oij,oik->ojk", Jp, Jp)
    )
    Hll = jnp.zeros((L, 3, 3)).at[obs.lm].add(
        w_total[:, None, None] * jnp.einsum("oij,oik->ojk", Jl, Jl)
    )
    bp = jnp.zeros((K, 6)).at[obs.kf].add(
        -w_total[:, None] * jnp.einsum("oij,oi->oj", Jp, r)
    )
    bl = jnp.zeros((L, 3)).at[obs.lm].add(
        -w_total[:, None] * jnp.einsum("oij,oi->oj", Jl, r)
    )
    Wpl = jnp.zeros((K, 6, L, 3)).at[obs.kf, :, obs.lm, :].add(
        w_total[:, None, None] * jnp.einsum("oij,oik->ojk", Jp, Jl)
    )
    return Hpp, Hll, bp, bl, Wpl


@functools.partial(jax.jit, static_argnames=("iters", "use_huber", "cam_model"))
def bundle_adjust(
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    X: jnp.ndarray,
    obs: Observations,
    fixed_pose: jnp.ndarray,
    fixed_point: jnp.ndarray,
    cam_params: jnp.ndarray,
    bf: float,
    iters: int = 10,
    use_huber: bool = True,
    cam_model: str = "pinhole",
    rig=None,
) -> BAResult:
    """Joint pose+structure LM with Schur-complement landmark elimination.

    R_cw [K,3,3], t_cw [K,3], X [L,3]; obs is the flat edge table;
    fixed_pose [K] / fixed_point [L] bool masks freeze variables (the
    reference's fixed-anchor and fixed-observer keyframes).

    One jit: the whole LM loop runs on device.
    """
    K = R_cw.shape[0]
    L = X.shape[0]
    delta2 = jnp.where(obs.u_right >= 0, CHI2_STEREO, CHI2_MONO)

    def total_cost(R, t, Xc):
        r, _, dok = factors.reproj_residuals(R, t, Xc, obs, cam_params, bf,
                                             cam_model, rig=rig)
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        c = jnp.where(use_huber, _robust_cost(chi2, delta2), chi2)
        return jnp.sum(c * (obs.valid & dok)), chi2

    def lm_iter(carry, _):
        R, t, Xc, lam, best_cost = carry
        r, row_mask, depth_ok = factors.reproj_residuals(
            R, t, Xc, obs, cam_params, bf, cam_model, rig=rig
        )
        chi2, w_h, _ = _eval_weights(r, obs, use_huber)
        w = obs.inv_sigma2 * w_h * (obs.valid & depth_ok)
        # freeze contributions of fixed variables by zeroing their Jacobians
        Hpp, Hll, bp, bl, Wpl = _build_normal_blocks(
            R, t, Xc, obs._replace(valid=obs.valid & depth_ok),
            cam_params, bf, w, row_mask, cam_model, rig=rig,
        )
        free_p = (~fixed_pose).astype(jnp.float32)
        free_l = (~fixed_point).astype(jnp.float32)
        bp = bp * free_p[:, None]
        bl = bl * free_l[:, None]
        Wpl = Wpl * free_p[:, None, None, None] * free_l[None, None, :, None]

        eye3 = jnp.eye(3)
        Hll_d = Hll + lam * jnp.eye(3)[None] * (
            jnp.trace(Hll, axis1=-2, axis2=-1)[:, None, None] / 3.0 + 1e-3
        )
        # fixed landmarks → identity block (delta forced to 0 via bl=0)
        Hll_d = jnp.where(fixed_point[:, None, None], eye3[None], Hll_d)
        Hll_inv = jnp.linalg.inv(Hll_d)

        # S = Hpp_diag − W Hll⁻¹ Wᵀ  (dense over pose pairs)
        Y = jnp.einsum("kilm,lmn->kiln", Wpl, Hll_inv)  # [K,6,L,3]
        S = -jnp.einsum("kiln,pjln->kipj", Y, Wpl)      # [K,6,K,6]
        diag_damp = lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp)) + 1e-6 * jnp.eye(6)[None]
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp + diag_damp)
        b_s = bp - jnp.einsum("kiln,ln->ki", Y, bl)

        # fixed poses → identity rows/cols
        Sf = S.reshape(K * 6, K * 6)
        fp = jnp.repeat(fixed_pose, 6)
        Sf = jnp.where(fp[:, None] | fp[None, :], 0.0, Sf)
        Sf = Sf + jnp.diag(fp.astype(jnp.float32))
        b_flat = jnp.where(fp, 0.0, b_s.reshape(-1))

        # LU with Jacobi scaling, NOT Cholesky: a marginally-non-PD f32
        # system makes Cholesky emit NaN, and NaN-poisoned landmarks mask
        # themselves out of the cost via the depth gate → silently accepted
        d = jnp.sqrt(jnp.clip(jnp.diag(Sf), 1e-10, None))
        dp = (jnp.linalg.solve(Sf / d[:, None] / d[None, :], b_flat / d) / d
              ).reshape(K, 6)
        dl = jnp.einsum(
            "lmn,ln->lm", Hll_inv, bl - jnp.einsum("kiln,ki->ln", Wpl, dp)
        )
        dl = dl * free_l[:, None]

        dR, dt = lie.se3_exp(dp)
        R_new = dR @ R
        t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
        X_new = Xc + dl
        cost_new, _ = total_cost(R_new, t_new, X_new)
        accept = (
            (cost_new < best_cost)
            & jnp.isfinite(dp).all() & jnp.isfinite(dl).all()
        )
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        Xc = jnp.where(accept, X_new, Xc)
        lam = jnp.where(accept, lam * 0.33, lam * 4.0)
        best_cost = jnp.where(accept, cost_new, best_cost)
        return (R, t, Xc, lam, best_cost), cost_new

    cost0, _ = total_cost(R_cw, t_cw, X)
    (R, t, Xc, _, _), _ = jax.lax.scan(
        lm_iter, (R_cw, t_cw, X, jnp.float32(1e-4), cost0), None, length=iters
    )
    R = lie.project_to_so3(R)
    _, chi2 = total_cost(R, t, Xc)
    inlier = (chi2 <= delta2) & obs.valid
    return BAResult(R, t, Xc, chi2, inlier)


# ---------------------------------------------------------------------------
# Matrix-free Schur BA: PCG on the reduced camera system.
#
# The dense path above materializes the pose-landmark coupling W as a
# [K,6,L,3] tensor — fine for local windows (K≤32, L≤4k) but ~1.2 GB at
# GBA scale (K=256, L=64k). Here S = Hpp − W Hll⁻¹ Wᵀ is never formed:
# its action on a vector is two gathers + two scatter-adds over the flat
# observation table (O(obs) work and memory), and the reduced system is
# solved with block-Jacobi-preconditioned conjugate gradients. This is the
# TPU analog of g2o's sparse BlockSolver + PCG (``Thirdparty/g2o/g2o/core/
# block_solver.hpp``) and the form that distributes: shard the observation
# table, psum the matvec (see ``parallel/dist_ba.py``).
# ---------------------------------------------------------------------------


def _schur_matvec(v, A, Hll_inv, kf, lm, Hpp_d, fixed_pose, L):
    """S·v for v [K,6] without materializing S.

    A [O,6,3] = w·Jpᵀ·Jl per observation (fixed rows/cols already zeroed),
    Hll_inv [L,3,3], Hpp_d [K,6,6] damped pose blocks.
    """
    K = v.shape[0]
    # u = Wᵀ v  (per landmark): u_l = Σ_{o→l} A_oᵀ v_{kf(o)}
    u = jnp.zeros((L, 3), v.dtype).at[lm].add(
        jnp.einsum("oij,oi->oj", A, v[kf])
    )
    y = jnp.einsum("lmn,ln->lm", Hll_inv, u)
    # W y (per pose): Σ_{o→k} A_o y_{lm(o)}
    Wy = jnp.zeros((K, 6), v.dtype).at[kf].add(
        jnp.einsum("oij,oj->oi", A, y[lm])
    )
    Sv = jnp.einsum("kij,kj->ki", Hpp_d, v) - Wy
    return jnp.where(fixed_pose[:, None], v, Sv)


def _pcg(matvec, b, Minv_blocks, iters):
    """Block-Jacobi PCG for S·x = b with x,b [K,6]."""
    def apply_M(r):
        return jnp.einsum("kij,kj->ki", Minv_blocks, r)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def step(carry, _):
        x, r, p, rz = carry
        Sp = matvec(p)
        pSp = jnp.sum(p * Sp)
        alpha = rz / jnp.where(jnp.abs(pSp) > 1e-20, pSp, 1.0)
        alpha = jnp.where(jnp.abs(pSp) > 1e-20, alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Sp
        z = apply_M(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1.0)
        beta = jnp.where(jnp.abs(rz) > 1e-20, beta, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(
        step, (x0, r0, p0, rz0), None, length=iters
    )
    return x


@functools.partial(
    jax.jit, static_argnames=("iters", "cg_iters", "use_huber", "cam_model")
)
def bundle_adjust_cg(
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    X: jnp.ndarray,
    obs: Observations,
    fixed_pose: jnp.ndarray,
    fixed_point: jnp.ndarray,
    cam_params: jnp.ndarray,
    bf: float,
    iters: int = 10,
    cg_iters: int = 24,
    use_huber: bool = True,
    cam_model: str = "pinhole",
    rig=None,
) -> BAResult:
    """Large-scale BA: LM with PCG on the (implicit) reduced camera system.

    Same contract as :func:`bundle_adjust`; memory is O(obs + K·36 + L·9)
    instead of O(K·L·18), so GBA-sized problems (K≥256, L≥64k) fit on chip.
    Replaces ``Optimizer::GlobalBundleAdjustemnt`` (``src/Optimizer.cc:54``)
    at map scale.
    """
    K = R_cw.shape[0]
    L = X.shape[0]
    delta2 = jnp.where(obs.u_right >= 0, CHI2_STEREO, CHI2_MONO)
    free_p = (~fixed_pose).astype(jnp.float32)
    free_l = (~fixed_point).astype(jnp.float32)
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)

    def total_cost(R, t, Xc):
        r, _, dok = factors.reproj_residuals(R, t, Xc, obs, cam_params, bf,
                                             cam_model, rig=rig)
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        c = jnp.where(use_huber, _robust_cost(chi2, delta2), chi2)
        return jnp.sum(c * (obs.valid & dok)), chi2

    def lm_iter(carry, _):
        R, t, Xc, lam, best_cost = carry
        r, row_mask, depth_ok = factors.reproj_residuals(
            R, t, Xc, obs, cam_params, bf, cam_model, rig=rig
        )
        chi2, w_h, _ = _eval_weights(r, obs, use_huber)
        w = obs.inv_sigma2 * w_h * (obs.valid & depth_ok)
        Jp, Jl = factors.reproj_jacobians(R, t, Xc, obs, cam_params, bf,
                                          cam_model, rig=rig)
        Jp = Jp * row_mask[:, :, None]
        Jl = Jl * row_mask[:, :, None]
        # per-obs blocks; fixed pose/point columns are zeroed at the source
        wf = w * free_p[obs.kf]
        wl = w * free_l[obs.lm]
        Hpp = jnp.zeros((K, 6, 6)).at[obs.kf].add(
            w[:, None, None] * jnp.einsum("oij,oik->ojk", Jp, Jp)
        )
        Hll = jnp.zeros((L, 3, 3)).at[obs.lm].add(
            w[:, None, None] * jnp.einsum("oij,oik->ojk", Jl, Jl)
        )
        bp = jnp.zeros((K, 6)).at[obs.kf].add(
            -w[:, None] * jnp.einsum("oij,oi->oj", Jp, r)
        ) * free_p[:, None]
        bl = jnp.zeros((L, 3)).at[obs.lm].add(
            -w[:, None] * jnp.einsum("oij,oi->oj", Jl, r)
        ) * free_l[:, None]
        A = (w * free_p[obs.kf] * free_l[obs.lm])[:, None, None] * jnp.einsum(
            "oij,oik->ojk", Jp, Jl
        )  # [O,6,3]

        Hll_d = Hll + lam * eye3[None] * (
            jnp.trace(Hll, axis1=-2, axis2=-1)[:, None, None] / 3.0 + 1e-3
        )
        Hll_d = jnp.where(fixed_point[:, None, None], eye3[None], Hll_d)
        Hll_inv = jnp.linalg.inv(Hll_d)

        Hpp_d = Hpp + lam * jax.vmap(jnp.diag)(
            jax.vmap(jnp.diag)(Hpp)
        ) + 1e-6 * eye6[None]
        Hpp_d = jnp.where(fixed_pose[:, None, None], eye6[None], Hpp_d)

        # RHS: b_s = bp − W Hll⁻¹ bl
        y0 = jnp.einsum("lmn,ln->lm", Hll_inv, bl)
        Wy0 = jnp.zeros((K, 6)).at[obs.kf].add(
            jnp.einsum("oij,oj->oi", A, y0[obs.lm])
        )
        b_s = jnp.where(fixed_pose[:, None], 0.0, bp - Wy0)

        # block-Jacobi preconditioner: S's diagonal blocks ≈ Hpp_d
        Minv = jnp.linalg.inv(Hpp_d)
        dp = _pcg(
            lambda v: _schur_matvec(
                v, A, Hll_inv, obs.kf, obs.lm, Hpp_d, fixed_pose, L
            ),
            b_s, Minv, cg_iters,
        )
        dp = dp * free_p[:, None]
        # back-substitute landmarks
        u = jnp.zeros((L, 3)).at[obs.lm].add(
            jnp.einsum("oij,oi->oj", A, dp[obs.kf])
        )
        dl = jnp.einsum("lmn,ln->lm", Hll_inv, bl - u) * free_l[:, None]

        dR, dt = lie.se3_exp(dp)
        R_new = dR @ R
        t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
        X_new = Xc + dl
        cost_new, _ = total_cost(R_new, t_new, X_new)
        accept = (
            (cost_new < best_cost)
            & jnp.isfinite(dp).all() & jnp.isfinite(dl).all()
        )
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        Xc = jnp.where(accept, X_new, Xc)
        lam = jnp.where(accept, lam * 0.33, lam * 4.0)
        best_cost = jnp.where(accept, cost_new, best_cost)
        return (R, t, Xc, lam, best_cost), cost_new

    cost0, _ = total_cost(R_cw, t_cw, X)
    (R, t, Xc, _, _), _ = jax.lax.scan(
        lm_iter, (R_cw, t_cw, X, jnp.float32(1e-4), cost0), None, length=iters
    )
    R = lie.project_to_so3(R)
    _, chi2 = total_cost(R, t, Xc)
    inlier = (chi2 <= delta2) & obs.valid
    return BAResult(R, t, Xc, chi2, inlier)
