"""Distributed whole-map visual-inertial BA over a TPU device mesh.

``Optimizer::FullInertialBA`` (``/root/reference/src/Optimizer.cc:397``) at
pod scale: the VISUAL observation table — the dominant FLOPs — is sharded
over the mesh 'obs' axis exactly like :mod:`parallel.dist_ba`; the inertial
preintegration chain, bias random walks and bias priors are tiny (K−1
edges of 9+6 dims) and are evaluated REPLICATED on every device, added to
the psum-reduced visual blocks. Per LM iteration the ICI traffic is the
visual block reduce ([K,6,6]+[K,6]+[L,3,3]+[L,3]) plus two [L,3]/[K,6]
psums per CG iteration; the [K,15] reduced system is solved identically on
all devices.

State (poses, velocities, biases, landmarks) stays replicated — the
15-dim-per-KF reduced system is small even at map capacity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from orb_slam3_detailed_comments_kor_tpu.optim import ba, factors, vi_ba
from orb_slam3_detailed_comments_kor_tpu.optim.factors import Observations
from orb_slam3_detailed_comments_kor_tpu.optim.vi_ba import (
    _L24_DIM, _L24_IS_J, VIState, eval_inertial,
)
from orb_slam3_detailed_comments_kor_tpu.parallel.dist_ba import (
    make_mesh, pad_obs_to_devices,
)
from orb_slam3_detailed_comments_kor_tpu.utils import lie


def distributed_vi_ba_cg(
    mesh: Mesh,
    st: VIState,
    X: jnp.ndarray,
    obs: Observations,
    edges: "vi_ba.InertialEdges",
    fixed_kf: jnp.ndarray,
    fixed_point: jnp.ndarray,
    cam_params: jnp.ndarray,
    R_cb: jnp.ndarray,
    t_cb: jnp.ndarray,
    bf,
    gravity: jnp.ndarray,
    gyro_walk_info: float,
    acc_walk_info: float,
    prior_bg_info: float = 0.0,
    prior_ba_info: float = 0.0,
    iters: int = 4,
    cg_iters: int = 24,
    cam_model: str = "pinhole",
    rig=None,
):
    """Obs-sharded matrix-free PCG Schur VI-LM (the distributed
    counterpart of :func:`optim.vi_ba.vi_bundle_adjust_cg`; same state /
    factor model, same [K,15] tangent ordering).

    Returns (VIState, X) refined (replicated).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    obs = pad_obs_to_devices(obs, n_dev)
    K = st.R_bw.shape[0]
    L = X.shape[0]
    PD = 15
    eye3 = jnp.eye(3)
    free_kf = (~fixed_kf).astype(jnp.float32)
    free_l = (~fixed_point).astype(jnp.float32)
    bg_prior0 = st.bg
    ba_prior0 = st.ba

    obs_spec = Observations(
        kf=P(axis), lm=P(axis), uv=P(axis), u_right=P(axis),
        inv_sigma2=P(axis), valid=P(axis),
        cam=None if obs.cam is None else P(axis),
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), obs_spec),
        out_specs=(P(), P()),
    )
    def run(st0, X0, obs_l):
        delta2 = jnp.where(
            obs_l.u_right >= 0, factors.CHI2_STEREO, factors.CHI2_MONO
        )

        def camera_pose(stc):
            R_cw = R_cb @ stc.R_bw
            t_cw = jnp.einsum("ij,kj->ki", R_cb, stc.t_bw) + t_cb
            return R_cw, t_cw

        def total_cost(stc, Xc):
            R_cw, t_cw = camera_pose(stc)
            r, _, dok = factors.reproj_residuals(
                R_cw, t_cw, Xc, obs_l, cam_params, bf, cam_model, rig=rig
            )
            chi2 = jnp.sum(r * r, axis=-1) * obs_l.inv_sigma2
            c_vis = jax.lax.psum(
                jnp.sum(ba._robust_cost(chi2, delta2) * (obs_l.valid & dok)),
                axis,
            )
            # inertial terms: replicated, identical on every device
            r_in, _ = eval_inertial(stc, edges, gravity)
            c_in = jnp.sum(
                jnp.einsum("ei,eij,ej->e", r_in, edges.info9, r_in)
                * edges.valid
            )
            dbg = stc.bg[edges.j] - stc.bg[edges.i]
            dba = stc.ba[edges.j] - stc.ba[edges.i]
            w_g = gyro_walk_info / jnp.maximum(edges.dt, 1e-3)
            w_a = acc_walk_info / jnp.maximum(edges.dt, 1e-3)
            c_rw = jnp.sum(
                (w_g * jnp.sum(dbg * dbg, -1) + w_a * jnp.sum(dba * dba, -1))
                * edges.valid
            )
            c_pr = prior_bg_info * jnp.sum(
                (stc.bg - bg_prior0) ** 2 * free_kf[:, None]
            ) + prior_ba_info * jnp.sum(
                (stc.ba - ba_prior0) ** 2 * free_kf[:, None]
            )
            return c_vis + c_in + c_rw + c_pr

        def lm_iter(carry, _):
            stc, Xc, lam, best_cost = carry
            R_cw, t_cw = camera_pose(stc)

            # ---- visual blocks on the local shard + psum -----------------
            r, row_mask, depth_ok = factors.reproj_residuals(
                R_cw, t_cw, Xc, obs_l, cam_params, bf, cam_model, rig=rig
            )
            chi2 = jnp.sum(r * r, axis=-1) * obs_l.inv_sigma2
            w_h = factors.huber_weight(chi2, delta2)
            w = obs_l.inv_sigma2 * w_h * (obs_l.valid & depth_ok)
            Rk = stc.R_bw[obs_l.kf]
            tk = stc.t_bw[obs_l.kf]
            Xo = Xc[obs_l.lm]
            pb = jnp.einsum("oij,oj->oi", Rk, Xo) + tk
            pc = jnp.einsum("ij,oj->oi", R_cb, pb) + t_cb
            _, Jproj, _ = factors._rig_select(
                obs_l, pc, cam_params, bf, cam_model, rig
            )
            eyeO = jnp.broadcast_to(jnp.eye(3), (pb.shape[0], 3, 3))
            dpb_dxi = jnp.concatenate([eyeO, -lie.hat(pb)], axis=-1)
            dpc_dxi = jnp.einsum("ij,ojk->oik", R_cb, dpb_dxi)
            Jp = -jnp.einsum("oij,ojk->oik", Jproj, dpc_dxi) \
                * row_mask[:, :, None]
            Jl = -jnp.einsum("oij,jk,okl->oil", Jproj, R_cb, Rk) \
                * row_mask[:, :, None]

            kf_l, lm_l = obs_l.kf, obs_l.lm
            Hpp6 = jax.lax.psum(
                jnp.zeros((K, 6, 6)).at[kf_l].add(
                    w[:, None, None] * jnp.einsum("oij,oik->ojk", Jp, Jp)
                ), axis,
            )
            Hll = jax.lax.psum(
                jnp.zeros((L, 3, 3)).at[lm_l].add(
                    w[:, None, None] * jnp.einsum("oij,oik->ojk", Jl, Jl)
                ), axis,
            )
            bp6 = jax.lax.psum(
                jnp.zeros((K, 6)).at[kf_l].add(
                    -w[:, None] * jnp.einsum("oij,oi->oj", Jp, r)
                ), axis,
            ) * free_kf[:, None]
            bl = jax.lax.psum(
                jnp.zeros((L, 3)).at[lm_l].add(
                    -w[:, None] * jnp.einsum("oij,oi->oj", Jl, r)
                ), axis,
            ) * free_l[:, None]
            A = (w * free_kf[kf_l] * free_l[lm_l])[:, None, None] \
                * jnp.einsum("oij,oik->ojk", Jp, Jl)  # local [O/n,6,3]

            Hll_d = Hll + lam * eye3[None] * (
                jnp.trace(Hll, axis1=-2, axis2=-1)[:, None, None] / 3.0
                + 1e-3
            )
            Hll_d = jnp.where(fixed_point[:, None, None], eye3[None], Hll_d)
            Hll_inv = jnp.linalg.inv(Hll_d)

            # ---- inertial edge blocks (replicated) -----------------------
            r_in, J_in = eval_inertial(stc, edges, gravity)
            kf_of = jnp.stack([edges.i, edges.j], axis=-1)
            ksel = kf_of[:, _L24_IS_J]
            free24 = free_kf[ksel]
            w_edge = edges.valid.astype(jnp.float32)
            Jw = J_in * w_edge[:, None, None]
            JtW = jnp.einsum(
                "eir,eis->ers", Jw,
                jnp.einsum("eij,ejk->eik", edges.info9, J_in),
            )
            JtW = JtW * free24[:, :, None] * free24[:, None, :]
            Jt_r = -jnp.einsum(
                "eir,eij,ej->er", Jw, edges.info9, r_in
            ) * free24

            w_g = gyro_walk_info / jnp.maximum(edges.dt, 1e-3) * w_edge
            w_a = acc_walk_info / jnp.maximum(edges.dt, 1e-3) * w_edge
            dbg = stc.bg[edges.j] - stc.bg[edges.i]
            dba = stc.ba[edges.j] - stc.ba[edges.i]
            rw_fi = free_kf[edges.i]
            rw_fj = free_kf[edges.j]

            # ---- RHS -----------------------------------------------------
            b = jnp.zeros((K, PD))
            b = b.at[:, 0:6].add(bp6)
            y0 = jnp.einsum("lmn,ln->lm", Hll_inv, bl)
            Wy0 = jax.lax.psum(
                jnp.zeros((K, 6)).at[kf_l].add(
                    jnp.einsum("oij,oj->oi", A, y0[lm_l])
                ), axis,
            )
            b = b.at[:, 0:6].add(-Wy0)
            b = b.at[ksel, _L24_DIM[None, :]].add(Jt_r)
            for (dim0, wgt, db) in ((9, w_g, dbg), (12, w_a, dba)):
                sl = slice(dim0, dim0 + 3)
                b = b.at[edges.i, sl].add((wgt * rw_fi)[:, None] * db)
                b = b.at[edges.j, sl].add(-(wgt * rw_fj)[:, None] * db)
            b = b.at[:, 9:12].add(-prior_bg_info * (stc.bg - bg_prior0))
            b = b.at[:, 12:15].add(-prior_ba_info * (stc.ba - ba_prior0))
            b = jnp.where(fixed_kf[:, None], 0.0, b)

            # ---- diagonal blocks -----------------------------------------
            D = jnp.zeros((K, PD, PD))
            D = D.at[:, 0:6, 0:6].add(Hpp6)
            D = D.at[edges.i, 0:15, 0:15].add(JtW[:, 0:15, 0:15])
            jdim = _L24_DIM[15:24]
            D = D.at[
                edges.j[:, None, None], jdim[None, :, None],
                jdim[None, None, :],
            ].add(JtW[:, 15:24, 15:24])
            d3 = jnp.arange(3)
            for (dim0, wgt) in ((9, w_g), (12, w_a)):
                dd = (d3 + dim0)[None, :]
                D = D.at[edges.i[:, None], dd, dd].add(
                    (wgt * rw_fi)[:, None]
                )
                D = D.at[edges.j[:, None], dd, dd].add(
                    (wgt * rw_fj)[:, None]
                )
            pr = jnp.zeros((PD,)).at[9:12].set(prior_bg_info).at[12:15].set(
                prior_ba_info
            )
            D = D + jnp.diag(pr)[None]
            diagD = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(D))
            D_d = D + lam * diagD + 1e-6 * jnp.eye(PD)[None]
            D_d = jnp.where(
                fixed_kf[:, None, None], jnp.eye(PD)[None], D_d
            )
            JtW_ij = JtW[:, 0:15, 15:24]

            def matvec(v):
                v6 = v[:, 0:6]
                u = jax.lax.psum(
                    jnp.zeros((L, 3), v.dtype).at[lm_l].add(
                        jnp.einsum("oij,oi->oj", A, v6[kf_l])
                    ), axis,
                )
                y = jnp.einsum("lmn,ln->lm", Hll_inv, u)
                Wy = jax.lax.psum(
                    jnp.zeros((K, 6), v.dtype).at[kf_l].add(
                        jnp.einsum("oij,oj->oi", A, y[lm_l])
                    ), axis,
                )
                Sv = jnp.einsum("kij,kj->ki", D_d, v)
                Sv = Sv.at[:, 0:6].add(-Wy)
                v_j9 = v[edges.j][:, jdim]
                v_i15 = v[edges.i][:, 0:15]
                Sv = Sv.at[edges.i, 0:15].add(
                    jnp.einsum("eij,ej->ei", JtW_ij, v_j9)
                )
                Sv = Sv.at[edges.j[:, None], jdim[None, :]].add(
                    jnp.einsum("eij,ei->ej", JtW_ij, v_i15)
                )
                for (dim0, wgt) in ((9, w_g), (12, w_a)):
                    sl = slice(dim0, dim0 + 3)
                    wf = (wgt * rw_fi * rw_fj)[:, None]
                    Sv = Sv.at[edges.i, sl].add(-wf * v[edges.j, sl])
                    Sv = Sv.at[edges.j, sl].add(-wf * v[edges.i, sl])
                return jnp.where(fixed_kf[:, None], v, Sv)

            Minv = jnp.linalg.inv(D_d)
            dx = ba._pcg(matvec, b, Minv, cg_iters)
            dx = dx * free_kf[:, None]
            u = jax.lax.psum(
                jnp.zeros((L, 3)).at[lm_l].add(
                    jnp.einsum("oij,oi->oj", A, dx[kf_l, 0:6])
                ), axis,
            )
            dl = jnp.einsum("lmn,ln->lm", Hll_inv, bl - u) * free_l[:, None]

            dRb, dtb = lie.se3_exp(dx[:, 0:6])
            st_new = VIState(
                R_bw=dRb @ stc.R_bw,
                t_bw=jnp.einsum("kij,kj->ki", dRb, stc.t_bw) + dtb,
                v=stc.v + dx[:, 6:9],
                bg=stc.bg + dx[:, 9:12],
                ba=stc.ba + dx[:, 12:15],
            )
            X_new = Xc + dl
            cost_new = total_cost(st_new, X_new)
            accept = (
                (cost_new < best_cost)
                & jnp.isfinite(dx).all() & jnp.isfinite(dl).all()
            )
            stc = jax.tree.map(
                lambda n, o: jnp.where(accept, n, o), st_new, stc
            )
            Xc = jnp.where(accept, X_new, Xc)
            lam = jnp.where(accept, lam * 0.33, lam * 4.0)
            best_cost = jnp.where(accept, cost_new, best_cost)
            return (stc, Xc, lam, best_cost), None

        cost0 = total_cost(st0, X0)
        (st_f, X_f, _, _), _ = jax.lax.scan(
            lm_iter, (st0, X0, jnp.float32(1e-4), cost0), None, length=iters
        )
        st_f = st_f._replace(R_bw=lie.project_to_so3(st_f.R_bw))
        return st_f, X_f

    return run(st, X, obs)


_VI_GBA_MESH = None


def distributed_full_inertial_ba(
    ms, ikf, gravity, cam_params, R_cb, t_cb, bf,
    prior_bg_info=0.0, prior_ba_info=0.0, iters: int = 2,
    cam_model: str = "pinhole", rig=None,
):
    """Mesh-routed FullInertialBA: builds the same whole-map problem as
    ``inertial.full_inertial_ba`` and solves it obs-sharded over all
    runtime devices (``LoopClosing.cc:2287-2289`` inertial GBA, SURVEY
    §2.4 communication backend). Returns (ms', ikf', None)."""
    global _VI_GBA_MESH
    from orb_slam3_detailed_comments_kor_tpu.slam import inertial

    if _VI_GBA_MESH is None or _VI_GBA_MESH.devices.size != len(jax.devices()):
        _VI_GBA_MESH = make_mesh()
    st, obs, edges, fixed_kf, fixed_point = inertial.build_fiba_problem(
        ms, ikf, R_cb, t_cb, rig=rig
    )
    st_f, X_f = distributed_vi_ba_cg(
        _VI_GBA_MESH, st, ms.lm_pos, obs, edges, fixed_kf, fixed_point,
        cam_params, R_cb, t_cb, jnp.float32(bf), gravity,
        gyro_walk_info=vi_ba.WALK_INFO_CAP,
        acc_walk_info=vi_ba.WALK_INFO_CAP,
        prior_bg_info=prior_bg_info, prior_ba_info=prior_ba_info,
        iters=iters, cam_model=cam_model, rig=rig,
    )
    ms, ikf = inertial.apply_fiba_result(
        ms, ikf, st_f, X_f, fixed_kf, R_cb, t_cb
    )
    return ms, ikf, None
