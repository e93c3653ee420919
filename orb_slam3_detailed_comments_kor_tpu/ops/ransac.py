"""Batched closed-form alignment + fixed-budget RANSAC.

TPU-native counterpart of ``Sim3Solver`` (``src/Sim3Solver.cc``: Horn
3-point Sim(3)/SE(3) inside adaptive RANSAC): adaptive iteration RANSAC is
data-dependent control flow, so we evaluate a FIXED budget of hypotheses in
one batch (vmap over hypothesis triplets) and argmax inliers — the pattern
SURVEY.md §7 prescribes for all RANSAC loops.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.utils import lie


def horn_align(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray,
    fix_scale: bool = True,
):
    """Weighted closed-form similarity: dst ≈ s·R·src + t (Horn/Umeyama).

    src/dst [M,3], weights [M] (can be a 0/1 mask). Returns (R, t, s).
    """
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    mu_s = jnp.sum(src * weights[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * weights[:, None], axis=0) / wsum
    xs = src - mu_s
    xd = dst - mu_d
    C = jnp.einsum("mi,mj,m->ij", xd, xs, weights) / wsum
    U, D, Vt = jnp.linalg.svd(C)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * 1.0).at[2, 2].set(
        jnp.sign(det) + (det == 0)
    )
    R = U @ S @ Vt
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        var_s = jnp.sum(xs * xs * weights[:, None]) / wsum
        s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, 1e-9)
    t = mu_d - s * (R @ mu_s)
    return R, t, s


class RansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray   # [M] bool
    n_inliers: jnp.ndarray


def sim3_ransac(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 128,
    inlier_th: float = 0.10,
    fix_scale: bool = True,
) -> RansacResult:
    """Fixed-budget 3-point RANSAC for dst ≈ s·R·src + t.

    src/dst [M,3] corresponding 3-D points; inlier test is Euclidean
    distance < inlier_th (the reference gates by reprojection in both
    cameras — 3-D distance is the camera-free equivalent at map scale).
    Refits on the best hypothesis' inliers.
    """
    M = src.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1e-9)
    idx = jax.random.choice(key, M, shape=(n_hyp, 3), p=probs)

    def one(tri):
        w = jnp.zeros((M,)).at[tri].set(1.0) * valid
        R, t, s = horn_align(src, dst, w, fix_scale)
        err = jnp.linalg.norm(
            dst - (s * (src @ R.T) + t), axis=-1
        )
        inl = (err < inlier_th) & valid
        return R, t, s, inl, jnp.sum(inl)

    Rs, ts, ss, inls, counts = jax.vmap(one)(idx)
    best = jnp.argmax(counts)
    # refit on the winning inlier set
    w = inls[best].astype(jnp.float32)
    R, t, s = horn_align(src, dst, w, fix_scale)
    err = jnp.linalg.norm(dst - (s * (src @ R.T) + t), axis=-1)
    inl = (err < inlier_th) & valid
    return RansacResult(R=R, t=t, s=s, inliers=inl, n_inliers=jnp.sum(inl))


def sim3_ransac_reproj(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    sigma2_a: jnp.ndarray,
    sigma2_b: jnp.ndarray,
    pose_a,
    pose_b,
    cam_params: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 128,
    chi2_th: float = 9.21,
    fix_scale: bool = True,
    refine_iters: int = 8,
    cam_model: str = "pinhole",
) -> RansacResult:
    """Sim3 RANSAC with REPROJECTION inlier gating in both cameras, plus a
    Gauss-Newton reprojection refine of the winning hypothesis.

    cam_model selects the projection for the pixel gate: "pinhole" or
    "kannala_brandt8" (fisheye loop verification previously fell back to a
    scale-dependent 0.12 m metric gate — the KB8 projection is exact and
    gauge-free).

    Mirrors ``Sim3Solver::CheckInliers`` (project each side's points
    through the hypothesis into the OTHER keyframe's camera and gate the
    pixel error per feature scale) and ``Optimizer::OptimizeSim3``
    (``src/Optimizer.cc:3251``). A 3-D-distance gate is scale-dependent in
    monocular maps (arbitrary gauge) — pixels are gauge-free.

    src/dst [M,3] matched landmark positions (current / loop side);
    uv_a/uv_b [M,2] their observed pixels in keyframes a (current) and b
    (loop); sigma2_* per-feature σ² (scale^2·level); pose_a/pose_b
    (R_cw, t_cw) of the two keyframes. The estimated warp maps
    current-map coordinates into loop-side coordinates: dst ≈ s·R·src + t.
    """
    from orb_slam3_detailed_comments_kor_tpu.models import camera as cam_mod

    Ra, ta = pose_a
    Rb, tb = pose_b
    M = src.shape[0]

    def cam_project(pc):
        z = jnp.maximum(pc[:, 2], 1e-6)
        pc_safe = pc.at[:, 2].set(z)
        return cam_mod.project(cam_params, pc_safe, cam_model)

    def project(R_cw, t_cw, P):
        pc = P @ R_cw.T + t_cw
        return cam_project(pc), pc[:, 2] > 1e-3

    # The matched pairs are two INDEPENDENT landmark entries for the same
    # physical point (duplicates across the loop), not two projections of
    # one entry like the reference's CheckInliers — their relative error
    # carries triangulation noise + accumulated map drift on top of the
    # pixel noise. Hypothesis SELECTION therefore uses a loosened gate
    # (4x chi2, i.e. 2x pixels) so a minimal-sample fit on the true
    # cluster captures the whole drift-spread cluster; the FINAL inlier
    # count after GN refinement uses the strict per-feature gate. With the
    # strict gate at both stages, true-cluster fits fragmented while tight
    # aliased clusters scored full marks and occasionally won RANSAC.
    def reproj_inliers(R, t, s, th=chi2_th):
        # forward: current points into the loop keyframe's camera
        Xb_hat = s * (src @ R.T) + t
        pb, okb = project(Rb, tb, Xb_hat)
        eb = jnp.sum((pb - uv_b) ** 2, -1) / jnp.maximum(sigma2_b, 1e-6)
        # backward: loop points into the current keyframe's camera
        si = 1.0 / jnp.maximum(s, 1e-9)
        Xa_hat = si * ((dst - t) @ R)
        pa, oka = project(Ra, ta, Xa_hat)
        ea = jnp.sum((pa - uv_a) ** 2, -1) / jnp.maximum(sigma2_a, 1e-6)
        return (eb < th) & (ea < th) & oka & okb & valid

    chi2_sel = 4.0 * chi2_th

    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1e-9)
    idx = jax.random.choice(key, M, shape=(n_hyp, 3), p=probs)

    def one(tri):
        w = jnp.zeros((M,)).at[tri].set(1.0) * valid
        R, t, s = horn_align(src, dst, w, fix_scale)
        inl = reproj_inliers(R, t, s, chi2_sel)
        return R, t, s, jnp.sum(inl)

    Rs, ts, ss, counts = jax.vmap(one)(idx)
    # Identity null hypothesis, always in the candidate set: when the two
    # sides ALREADY agree (an IMU-tight map revisiting a consistent
    # region), the honest answer is "no correction". Without it, a
    # minimal-sample fit on an aliased/degenerate match cluster can win
    # argmax outright — observed once in a 3000-frame run: a 0.63 m warp
    # passed both reprojection gates on a map whose true internal
    # inconsistency was 0.03 m, and the closure injected 0.6 m of error.
    # Ties break toward identity (argmax picks the first index).
    R_id = jnp.eye(3)
    t_id = jnp.zeros((3,))
    s_id = jnp.float32(1.0)
    n_id = jnp.sum(reproj_inliers(R_id, t_id, s_id, chi2_sel))
    Rs = jnp.concatenate([R_id[None], Rs])
    ts = jnp.concatenate([t_id[None], ts])
    ss = jnp.concatenate([s_id[None], ss])
    counts = jnp.concatenate([n_id[None], counts])
    best = jnp.argmax(counts)
    R, t, s = Rs[best], ts[best], ss[best]
    inl = reproj_inliers(R, t, s, chi2_sel)

    # Horn refit on inliers, then Gauss-Newton on both-direction
    # reprojection residuals over (φ, ρ, λ) — OptimizeSim3's objective
    R, t, s = horn_align(src, dst, inl.astype(jnp.float32), fix_scale)

    def residuals(params, R0, t0, s0):
        phi, rho, lam = params[:3], params[3:6], params[6]
        dR = lie.so3_exp(phi)
        R_ = dR @ R0
        s_ = s0 * jnp.exp(lam if not fix_scale else 0.0 * lam)
        t_ = dR @ t0 + rho
        Xb_hat = s_ * (src @ R_.T) + t_
        pb = cam_project(Xb_hat @ Rb.T + tb)
        si = 1.0 / jnp.maximum(s_, 1e-9)
        Xa_hat = si * ((dst - t_) @ R_)
        pa = cam_project(Xa_hat @ Ra.T + ta)
        wb = (inl / jnp.maximum(sigma2_b, 1e-6))[:, None]
        wa = (inl / jnp.maximum(sigma2_a, 1e-6))[:, None]
        return jnp.concatenate(
            [((pb - uv_b) * jnp.sqrt(wb)).reshape(-1),
             ((pa - uv_a) * jnp.sqrt(wa)).reshape(-1)]
        )

    def gn_step(carry, _):
        R_, t_, s_ = carry
        f = lambda p: residuals(p, R_, t_, s_)
        p0 = jnp.zeros((7,))
        r0 = f(p0)
        J = jax.jacfwd(f)(p0)  # [4M, 7]
        H = J.T @ J + 1e-6 * jnp.eye(7)
        dx = -jnp.linalg.solve(H, J.T @ r0)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dR = lie.so3_exp(dx[:3])
        R_n = dR @ R_
        t_n = dR @ t_ + dx[3:6]
        s_n = s_ * jnp.exp(jnp.where(fix_scale, 0.0, dx[6]))
        return (R_n, t_n, s_n), None

    (R, t, s), _ = jax.lax.scan(gn_step, (R, t, s), None,
                                length=refine_iters)
    R = lie.project_to_so3(R)
    inl = reproj_inliers(R, t, s)
    return RansacResult(R=R, t=t, s=s, inliers=inl, n_inliers=jnp.sum(inl))


def mlpnp_refine(
    X: jnp.ndarray,
    uv: jnp.ndarray,
    w: jnp.ndarray,
    cam_params: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    iters: int = 6,
    sigma_px: float = 1.0,
):
    """Maximum-likelihood PnP polish (MLPnP formulation — reference
    ``src/MLPnPsolver.cpp``, Urban et al. 2016).

    Residuals live in the 2-D tangent (null) space of each observed bearing
    vector and are weighted by the bearing covariance propagated from pixel
    noise: e_i = N_iᵀ·normalize(R·X_i + t), with N_i = [r_i s_i] an
    orthonormal basis of v_i^⊥ and W_i = (N_iᵀ Σ_v N_i)⁻¹. Compared to
    pixel-reprojection GN this weights observations by their true angular
    information — wide-angle and far-field points are no longer distorted
    by the planar projection metric. Pure batched GN on se(3): one jitted
    program, no per-point host work.

    X [M,3] world points, uv [M,2] pixels, w [M] inlier weights (0/1 or
    soft), R0/t0 the RANSAC pose to polish. Returns (R, t).
    """
    fx, fy, cx, cy = cam_params[0], cam_params[1], cam_params[2], cam_params[3]
    # observed bearings + d(bearing)/d(pixel) for covariance propagation
    m = jnp.stack(
        [(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy, jnp.ones_like(uv[:, 0])],
        axis=-1,
    )  # [M,3] unnormalized
    norm_m = jnp.linalg.norm(m, axis=-1, keepdims=True)
    v = m / norm_m  # observed unit bearings
    # tangent basis of v^⊥: seed with the axis least aligned with v
    seed = jnp.where(
        (jnp.abs(v[:, 0]) < 0.9)[:, None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), v.shape),
    )
    r_b = jnp.cross(v, seed)
    r_b = r_b / jnp.linalg.norm(r_b, axis=-1, keepdims=True)
    s_b = jnp.cross(v, r_b)
    N = jnp.stack([r_b, s_b], axis=-1)  # [M,3,2]

    # Σ_v = J_px Σ_px J_pxᵀ with J_px = d v/d uv = P_v · diag(1/fx,1/fy)/|m|,
    # P_v = (I - v vᵀ) the normalization projector
    P_v = jnp.eye(3)[None] - jnp.einsum("mi,mj->mij", v, v)
    J_px = (
        P_v[:, :, :2]
        * jnp.array([1.0, 1.0])[None, None, :]
        / jnp.stack([fx * norm_m[:, 0], fy * norm_m[:, 0]], -1)[:, None, :]
    )  # [M,3,2]
    sigma_v = (sigma_px ** 2) * jnp.einsum("mik,mjk->mij", J_px, J_px)
    E = jnp.einsum("mki,mkl,mlj->mij", N, sigma_v, N)  # [M,2,2]
    W = jnp.linalg.inv(E + 1e-12 * jnp.eye(2)[None])   # ML information

    def body(_, carry):
        R, t = carry
        p = X @ R.T + t
        nrm = jnp.linalg.norm(p, axis=-1, keepdims=True)
        n = p / jnp.maximum(nrm, 1e-9)
        e = jnp.einsum("mij,mi->mj", N, n)  # [M,2] tangent residuals
        # d n/d p = (I - n nᵀ)/|p| ; d p/d ξ = [I | -hat(p)]
        Pn = (jnp.eye(3)[None] - jnp.einsum("mi,mj->mij", n, n)) / jnp.maximum(
            nrm[:, :, None], 1e-9
        )
        dp = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), (X.shape[0], 3, 3)), -lie.hat(p)],
            axis=-1,
        )  # [M,3,6]
        J = jnp.einsum("mij,mik,mkl->mjl", N, Pn, dp)  # [M,2,6]
        H = jnp.einsum("mij,mik,mkl,m->jl", J, W, J, w) + 1e-6 * jnp.eye(6)
        b = -jnp.einsum("mij,mik,mk,m->j", J, W, e, w)
        dx = jnp.linalg.solve(H, b)
        dR, dt = lie.se3_exp(dx)
        return dR @ R, dR @ t + dt

    return jax.lax.fori_loop(0, iters, body, (R0, t0))


def pnp_ransac(
    X: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    cam_params: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 256,
    n_sample: int = 4,
    inlier_px: float = 5.0,
    refine_iters: int = 8,
):
    """Batched P4P RANSAC for camera pose from 3D-2D matches
    (relocalization: replaces MLPnPsolver RANSAC, ``src/MLPnPsolver.cpp``).

    Hypotheses are generated by aligning the observed bearing-scaled points:
    for a minimal sample we run a few Gauss-Newton steps of pose-only
    optimization from a rough init, all batched over hypotheses.
    Returns (R_cw, t_cw, inlier_mask, n_inliers).
    """
    from orb_slam3_detailed_comments_kor_tpu.optim import ba

    M = X.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1e-9)
    idx = jax.random.choice(key, M, shape=(n_hyp, n_sample), p=probs)
    fx, fy, cx, cy = cam_params[0], cam_params[1], cam_params[2], cam_params[3]

    def project(R, t, P):
        pc = P @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        return jnp.stack(
            [fx * pc[:, 0] / z + cx, fy * pc[:, 1] / z + cy], axis=-1
        )

    def gn_refine(R, t, P, obs_uv, w, iters):
        def body(_, carry):
            R, t = carry
            pc = P @ R.T + t
            z = jnp.maximum(pc[:, 2], 1e-6)
            pred = jnp.stack(
                [fx * pc[:, 0] / z + cx, fy * pc[:, 1] / z + cy], axis=-1
            )
            r = (obs_uv - pred)
            zi = 1.0 / z
            zero = jnp.zeros_like(zi)
            Ju = jnp.stack([fx * zi, zero, -fx * pc[:, 0] * zi * zi], -1)
            Jv = jnp.stack([zero, fy * zi, -fy * pc[:, 1] * zi * zi], -1)
            Jproj = jnp.stack([Ju, Jv], axis=-2)  # [M,2,3]
            eye = jnp.broadcast_to(jnp.eye(3), (P.shape[0], 3, 3))
            dpc = jnp.concatenate([eye, -lie.hat(pc)], axis=-1)
            J = -jnp.einsum("mij,mjk->mik", Jproj, dpc)  # [M,2,6]
            H = jnp.einsum("mij,mik,m->jk", J, J, w) + 1e-4 * jnp.eye(6)
            b = -jnp.einsum("mij,mi,m->j", J, r, w)
            dx = jnp.linalg.solve(H, b)
            dR, dt = lie.se3_exp(dx)
            return dR @ R, dR @ t + dt

        return jax.lax.fori_loop(0, iters, body, (R, t))

    def one(sample):
        P = X[sample]
        # init: camera at centroid of sample looking along +z toward points
        c = P.mean(0)
        t0 = jnp.array([0.0, 0.0, 1.0]) * jnp.linalg.norm(c) - c
        R0 = jnp.eye(3)
        w = jnp.ones((n_sample,))
        R, t = gn_refine(R0, t0, P, uv[sample], w, 12)
        pred = project(R, t, X)
        err = jnp.linalg.norm(uv - pred, axis=-1)
        depth_ok = (X @ R.T + t)[:, 2] > 0.01
        inl = (err < inlier_px) & valid & depth_ok
        return R, t, inl, jnp.sum(inl)

    Rs, ts, inls, counts = jax.vmap(one)(idx)
    best = jnp.argmax(counts)
    R, t = gn_refine(
        Rs[best], ts[best], X, uv, inls[best].astype(jnp.float32),
        refine_iters,
    )
    pred = project(R, t, X)
    err = jnp.linalg.norm(uv - pred, axis=-1)
    depth_ok = (X @ R.T + t)[:, 2] > 0.01
    inl = (err < inlier_px) & valid & depth_ok
    # ML polish over the consensus set (MLPnP tangent-space formulation,
    # ``src/MLPnPsolver.cpp`` — the reference refines its RANSAC pose the
    # same way); weighting by true angular information sharpens the pose
    # when inliers span a wide field of view or depth range
    R, t = mlpnp_refine(
        X, uv, inl.astype(jnp.float32), cam_params, R, t, iters=4
    )
    pred = project(R, t, X)
    err = jnp.linalg.norm(uv - pred, axis=-1)
    depth_ok = (X @ R.T + t)[:, 2] > 0.01
    inl = (err < inlier_px) & valid & depth_ok
    return R, t, inl, jnp.sum(inl)
