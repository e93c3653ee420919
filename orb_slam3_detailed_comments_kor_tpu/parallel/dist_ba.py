"""Distributed bundle adjustment over a TPU device mesh.

The reference is single-process shared-memory (SURVEY.md §2.4: no NCCL/MPI);
its global BA (``Optimizer.cc:62``, ``FullInertialBA``) simply runs longer on
one core.  Here global BA scales across chips the TPU-native way:

- the flat Observations table is sharded over the mesh 'obs' axis
  (data-parallel residual/Jacobian evaluation — the dominant FLOPs);
- each device scatter-accumulates its partial normal-equation blocks
  (Hpp [K,6,6], Hll [L,3,3], b, and the pose-landmark coupling W);
- one ``psum`` over ICI reduces the blocks; the Schur-reduced camera system
  (small: 6K x 6K) is solved identically on every device (replicated), so
  no further communication is needed inside an LM iteration.

This is the block-Schur + psum recipe from SURVEY.md §5 "Distributed
communication backend".  Landmark-sharded variants (reduce_scatter of Hll)
are a planned optimization for maps that exceed replicated HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam3_detailed_comments_kor_tpu.optim import ba, factors
from orb_slam3_detailed_comments_kor_tpu.optim.factors import Observations
from orb_slam3_detailed_comments_kor_tpu.utils import lie


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def pad_obs_to_devices(obs: Observations, n_dev: int) -> Observations:
    """Pad the observation table so its length divides the mesh size."""
    O = obs.kf.shape[0]
    pad = (-O) % n_dev
    if pad == 0:
        return obs
    f = lambda x: jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return Observations(
        kf=f(obs.kf), lm=f(obs.lm), uv=f(obs.uv),
        # pad rows are mono-masked (u_right < 0); real rows pass through
        u_right=jnp.concatenate([obs.u_right, -jnp.ones((pad,))]),
        inv_sigma2=f(obs.inv_sigma2),
        valid=jnp.concatenate([obs.valid, jnp.zeros((pad,), bool)]),
        cam=None if obs.cam is None else f(obs.cam),
    )


def distributed_bundle_adjust(
    mesh: Mesh,
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    X: jnp.ndarray,
    obs: Observations,
    fixed_pose: jnp.ndarray,
    fixed_point: jnp.ndarray,
    cam_params: jnp.ndarray,
    bf: float,
    iters: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sharded LM-BA step. Obs sharded over mesh axis; state replicated.

    Returns (R_cw, t_cw, X) refined.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    obs = pad_obs_to_devices(obs, n_dev)
    K, L = R_cw.shape[0], X.shape[0]
    delta2 = jnp.where(obs.u_right >= 0, factors.CHI2_STEREO, factors.CHI2_MONO)

    obs_spec = Observations(
        kf=P(axis), lm=P(axis), uv=P(axis), u_right=P(axis),
        inv_sigma2=P(axis), valid=P(axis),
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), obs_spec),
        out_specs=(P(), P(), P()),
    )
    def run(R0, t0, X0, obs_l):
        def total_cost(R, t, Xc):
            r, _, dok = factors.reproj_residuals(
                R, t, Xc, obs_l, cam_params, bf
            )
            chi2 = jnp.sum(r * r, axis=-1) * obs_l.inv_sigma2
            d2 = jnp.where(obs_l.u_right >= 0, factors.CHI2_STEREO, factors.CHI2_MONO)
            c = jnp.sum(ba._robust_cost(chi2, d2) * (obs_l.valid & dok))
            return jax.lax.psum(c, axis)

        def lm_iter(carry, _):
            R, t, Xc, lam, best_cost = carry
            r, row_mask, depth_ok = factors.reproj_residuals(
                R, t, Xc, obs_l, cam_params, bf
            )
            chi2 = jnp.sum(r * r, axis=-1) * obs_l.inv_sigma2
            d2 = jnp.where(obs_l.u_right >= 0, factors.CHI2_STEREO, factors.CHI2_MONO)
            w_h = factors.huber_weight(chi2, d2)
            w = obs_l.inv_sigma2 * w_h * (obs_l.valid & depth_ok)
            Hpp, Hll, bp, bl, Wpl = ba._build_normal_blocks(
                R, t, Xc, obs_l._replace(valid=obs_l.valid & depth_ok),
                cam_params, bf, w, row_mask,
            )
            # ICI reduction of the partial blocks
            Hpp = jax.lax.psum(Hpp, axis)
            Hll = jax.lax.psum(Hll, axis)
            bp = jax.lax.psum(bp, axis)
            bl = jax.lax.psum(bl, axis)
            Wpl = jax.lax.psum(Wpl, axis)

            free_p = (~fixed_pose).astype(jnp.float32)
            free_l = (~fixed_point).astype(jnp.float32)
            bp = bp * free_p[:, None]
            bl = bl * free_l[:, None]
            Wpl = Wpl * free_p[:, None, None, None] * free_l[None, None, :, None]

            eye3 = jnp.eye(3)
            Hll_d = Hll + lam * jnp.eye(3)[None] * (
                jnp.trace(Hll, axis1=-2, axis2=-1)[:, None, None] / 3.0 + 1e-3
            )
            Hll_d = jnp.where(fixed_point[:, None, None], eye3[None], Hll_d)
            Hll_inv = jnp.linalg.inv(Hll_d)
            Y = jnp.einsum("kilm,lmn->kiln", Wpl, Hll_inv)
            S = -jnp.einsum("kiln,pjln->kipj", Y, Wpl)
            diag_damp = (
                lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp))
                + 1e-6 * jnp.eye(6)[None]
            )
            S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp + diag_damp)
            b_s = bp - jnp.einsum("kiln,ln->ki", Y, bl)
            Sf = S.reshape(K * 6, K * 6)
            fp = jnp.repeat(fixed_pose, 6)
            Sf = jnp.where(fp[:, None] | fp[None, :], 0.0, Sf)
            Sf = Sf + jnp.diag(fp.astype(jnp.float32))
            b_flat = jnp.where(fp, 0.0, b_s.reshape(-1))
            d = jnp.sqrt(jnp.clip(jnp.diag(Sf), 1e-10, None))
            dp = (jnp.linalg.solve(Sf / d[:, None] / d[None, :], b_flat / d)
                  / d).reshape(K, 6)
            dl = jnp.einsum(
                "lmn,ln->lm", Hll_inv,
                bl - jnp.einsum("kiln,ki->ln", Wpl, dp),
            ) * free_l[:, None]
            dR, dt = lie.se3_exp(dp)
            R_new = dR @ R
            t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
            X_new = Xc + dl
            cost_new = total_cost(R_new, t_new, X_new)
            accept = (
                (cost_new < best_cost)
                & jnp.isfinite(dp).all() & jnp.isfinite(dl).all()
            )
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            Xc = jnp.where(accept, X_new, Xc)
            lam = jnp.where(accept, lam * 0.33, lam * 4.0)
            best_cost = jnp.where(accept, cost_new, best_cost)
            return (R, t, Xc, lam, best_cost), None

        cost0 = total_cost(R0, t0, X0)
        (R, t, Xc, _, _), _ = jax.lax.scan(
            lm_iter, (R0, t0, X0, jnp.float32(1e-4), cost0), None,
            length=iters,
        )
        return lie.project_to_so3(R), t, Xc

    return run(R_cw, t_cw, X, obs)


def distributed_bundle_adjust_cg(
    mesh: Mesh,
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    X: jnp.ndarray,
    obs: Observations,
    fixed_pose: jnp.ndarray,
    fixed_point: jnp.ndarray,
    cam_params: jnp.ndarray,
    bf: float,
    iters: int = 8,
    cg_iters: int = 20,
    cam_model: str = "pinhole",
    rig=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GBA-scale distributed LM-BA: obs-sharded matrix-free PCG Schur.

    Unlike :func:`distributed_bundle_adjust`, the pose-landmark coupling is
    never materialized (the dense [K,6,L,3] psum is ~1.2 GB at K=256 /
    L=64k): each device keeps only its observation shard's per-obs blocks
    A_o = w·Jpᵀ·Jl and applies the reduced camera system with two local
    scatter-adds + two ``psum``s per CG iteration (ICI traffic per LM
    iteration ≈ one [L,3,3] block reduce + cg_iters·([L,3]+[K,6])).
    State (poses, points) stays replicated.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    obs = pad_obs_to_devices(obs, n_dev)
    K, L = R_cw.shape[0], X.shape[0]

    obs_spec = Observations(
        kf=P(axis), lm=P(axis), uv=P(axis), u_right=P(axis),
        inv_sigma2=P(axis), valid=P(axis),
        cam=None if obs.cam is None else P(axis),
    )
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), obs_spec),
        out_specs=(P(), P(), P()),
    )
    def run(R0, t0, X0, obs_l):
        free_p = (~fixed_pose).astype(jnp.float32)
        free_l = (~fixed_point).astype(jnp.float32)

        def total_cost(R, t, Xc):
            r, _, dok = factors.reproj_residuals(
                R, t, Xc, obs_l, cam_params, bf, cam_model, rig=rig
            )
            chi2 = jnp.sum(r * r, axis=-1) * obs_l.inv_sigma2
            d2 = jnp.where(
                obs_l.u_right >= 0, factors.CHI2_STEREO, factors.CHI2_MONO
            )
            c = jnp.sum(ba._robust_cost(chi2, d2) * (obs_l.valid & dok))
            return jax.lax.psum(c, axis)

        def lm_iter(carry, _):
            R, t, Xc, lam, best_cost = carry
            r, row_mask, depth_ok = factors.reproj_residuals(
                R, t, Xc, obs_l, cam_params, bf, cam_model, rig=rig
            )
            chi2 = jnp.sum(r * r, axis=-1) * obs_l.inv_sigma2
            d2 = jnp.where(
                obs_l.u_right >= 0, factors.CHI2_STEREO, factors.CHI2_MONO
            )
            w_h = factors.huber_weight(chi2, d2)
            w = obs_l.inv_sigma2 * w_h * (obs_l.valid & depth_ok)
            Jp, Jl = factors.reproj_jacobians(R, t, Xc, obs_l, cam_params, bf,
                                              cam_model, rig=rig)
            Jp = Jp * row_mask[:, :, None]
            Jl = Jl * row_mask[:, :, None]
            kf_l, lm_l = obs_l.kf, obs_l.lm
            Hpp = jax.lax.psum(
                jnp.zeros((K, 6, 6)).at[kf_l].add(
                    w[:, None, None] * jnp.einsum("oij,oik->ojk", Jp, Jp)
                ), axis,
            )
            Hll = jax.lax.psum(
                jnp.zeros((L, 3, 3)).at[lm_l].add(
                    w[:, None, None] * jnp.einsum("oij,oik->ojk", Jl, Jl)
                ), axis,
            )
            bp = jax.lax.psum(
                jnp.zeros((K, 6)).at[kf_l].add(
                    -w[:, None] * jnp.einsum("oij,oi->oj", Jp, r)
                ), axis,
            ) * free_p[:, None]
            bl = jax.lax.psum(
                jnp.zeros((L, 3)).at[lm_l].add(
                    -w[:, None] * jnp.einsum("oij,oi->oj", Jl, r)
                ), axis,
            ) * free_l[:, None]
            A = (w * free_p[kf_l] * free_l[lm_l])[:, None, None] * jnp.einsum(
                "oij,oik->ojk", Jp, Jl
            )  # local shard's coupling blocks [O/n,6,3]

            Hll_d = Hll + lam * eye3[None] * (
                jnp.trace(Hll, axis1=-2, axis2=-1)[:, None, None] / 3.0 + 1e-3
            )
            Hll_d = jnp.where(fixed_point[:, None, None], eye3[None], Hll_d)
            Hll_inv = jnp.linalg.inv(Hll_d)
            Hpp_d = Hpp + lam * jax.vmap(jnp.diag)(
                jax.vmap(jnp.diag)(Hpp)
            ) + 1e-6 * eye6[None]
            Hpp_d = jnp.where(fixed_pose[:, None, None], eye6[None], Hpp_d)

            def Wt(v):  # [K,6] → [L,3], psum'd
                u = jnp.zeros((L, 3)).at[lm_l].add(
                    jnp.einsum("oij,oi->oj", A, v[kf_l])
                )
                return jax.lax.psum(u, axis)

            def Wv(y):  # [L,3] → [K,6], psum'd
                u = jnp.zeros((K, 6)).at[kf_l].add(
                    jnp.einsum("oij,oj->oi", A, y[lm_l])
                )
                return jax.lax.psum(u, axis)

            def matvec(v):
                y = jnp.einsum("lmn,ln->lm", Hll_inv, Wt(v))
                Sv = jnp.einsum("kij,kj->ki", Hpp_d, v) - Wv(y)
                return jnp.where(fixed_pose[:, None], v, Sv)

            y0 = jnp.einsum("lmn,ln->lm", Hll_inv, bl)
            b_s = jnp.where(fixed_pose[:, None], 0.0, bp - Wv(y0))
            Minv = jnp.linalg.inv(Hpp_d)
            dp = ba._pcg(matvec, b_s, Minv, cg_iters) * free_p[:, None]
            dl = jnp.einsum(
                "lmn,ln->lm", Hll_inv, bl - Wt(dp)
            ) * free_l[:, None]

            dR, dt = lie.se3_exp(dp)
            R_new = dR @ R
            t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
            X_new = Xc + dl
            cost_new = total_cost(R_new, t_new, X_new)
            accept = (
                (cost_new < best_cost)
                & jnp.isfinite(dp).all() & jnp.isfinite(dl).all()
            )
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            Xc = jnp.where(accept, X_new, Xc)
            lam = jnp.where(accept, lam * 0.33, lam * 4.0)
            best_cost = jnp.where(accept, cost_new, best_cost)
            return (R, t, Xc, lam, best_cost), None

        cost0 = total_cost(R0, t0, X0)
        (R, t, Xc, _, _), _ = jax.lax.scan(
            lm_iter, (R0, t0, X0, jnp.float32(1e-4), cost0), None,
            length=iters,
        )
        return lie.project_to_so3(R), t, Xc

    return run(R_cw, t_cw, X, obs)
