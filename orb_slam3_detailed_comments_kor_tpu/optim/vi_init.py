"""Visual-inertial initialization: gravity / scale / bias / velocity solve.

TPU-native counterpart of ``Optimizer::InertialOptimization``
(``src/Optimizer.cc:4686,4871,5032,5193``) driven by
``LocalMapping::InitializeIMU`` (``src/LocalMapping.cc:1566``): with the
visual keyframe poses HELD FIXED (the map is taken as metrically correct up
to scale for mono), solve for
  - a shared gyro + accelerometer bias,
  - per-keyframe world velocities,
  - the gravity direction (2 DoF rotation of a reference gravity vector),
  - optionally a global scale (mono only; stereo has metric scale already).

The problem is tiny (dim 8+1+3K) and dense — one autodiff GN/LM loop in a
single jit.  The caller then re-gauges the map (``Map::ApplyScaledRotation``
analog) or simply adopts the estimated gravity vector for all subsequent
inertial factors (our default: keep the world frame, carry g).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.optim.vi_ba import InertialEdges, inertial_residual
from orb_slam3_detailed_comments_kor_tpu.utils import lie


class VIInitResult(NamedTuple):
    bias_g: jnp.ndarray   # [3]
    bias_a: jnp.ndarray   # [3]
    v: jnp.ndarray        # [K,3]
    gravity: jnp.ndarray  # [3] estimated world gravity vector (magnitude G)
    scale: jnp.ndarray    # scalar
    chi2: jnp.ndarray     # final cost


@functools.partial(jax.jit, static_argnames=("iters", "estimate_scale"))
def inertial_optimization(
    R_bw: jnp.ndarray,
    t_bw: jnp.ndarray,
    edges: InertialEdges,
    g0: jnp.ndarray,
    g_mag: float = 9.81,
    iters: int = 20,
    estimate_scale: bool = False,
    prior_g_info: float = 1e2,
    prior_a_info: float = 1e5,
) -> VIInitResult:
    """Solve {bg, ba, v, gravity-dir[, scale]} with poses fixed.

    R_bw/t_bw: [K] fixed body poses (world→body). edges: preintegration
    chain. g0: initial gravity guess (world), magnitude ~g_mag.
    """
    K = R_bw.shape[0]
    E = edges.i.shape[0]
    # gravity parametrized as R(exp(δ·basis)) @ g0_unit * g_mag with δ ∈ R²
    g0_unit = g0 / jnp.linalg.norm(g0)
    # orthonormal basis perpendicular to g0
    a = jnp.where(jnp.abs(g0_unit[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]),
                  jnp.array([0.0, 1.0, 0.0]))
    b1 = jnp.cross(g0_unit, a)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(g0_unit, b1)

    # initial velocities: finite differences of positions over edges
    p = -jnp.einsum("kji,kj->ki", R_bw, t_bw)  # body positions in world

    v0 = jnp.zeros((K, 3))
    dp = (p[edges.j] - p[edges.i]) / jnp.maximum(edges.dt[:, None], 1e-3)
    v0 = v0.at[edges.i].set(dp)
    v0 = v0.at[edges.j[-1]].set(dp[-1])

    def unpack(theta):
        bg = theta[0:3]
        ba = theta[3:6]
        delta = theta[6:8]
        log_s = theta[8]
        v = theta[9:].reshape(K, 3)
        g = lie.so3_exp(delta[0] * b1 + delta[1] * b2) @ g0_unit * g_mag
        s = jnp.exp(log_s) if estimate_scale else jnp.float32(1.0)
        return bg, ba, g, s, v

    def residuals(theta):
        bg, ba, g, s, v = unpack(theta)
        # scaled positions: p' = s·p → t_bw' = s·t_bw (rotation unchanged)
        t_s = s * t_bw

        def one(e):
            return inertial_residual(
                R_bw[edges.i[e]], t_s[edges.i[e]], v[edges.i[e]], bg, ba,
                R_bw[edges.j[e]], t_s[edges.j[e]], v[edges.j[e]], e, edges, g,
            )

        r = jax.vmap(one)(jnp.arange(E))  # [E,9]
        return jnp.where(edges.valid[:, None], r, 0.0)

    D = 9 + 3 * K

    def cost_of(theta):
        r = residuals(theta)
        c = jnp.sum(jnp.einsum("ei,eij,ej->e", r, edges.info9, r))
        # bias priors (reference priorG=1e2, priorA=1e5 at first init:
        # with little rotation, acc bias and gravity direction are nearly
        # degenerate — the strong acc prior resolves it toward gravity)
        c = c + prior_g_info * jnp.sum(theta[0:3] ** 2)
        c = c + prior_a_info * jnp.sum(theta[3:6] ** 2)
        return c

    def lm_iter(carry, _):
        theta, lam, best = carry
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta)  # [E,9,D]
        JtWJ = jnp.einsum("eid,eij,ejc->dc", J, edges.info9, J)
        JtWr = jnp.einsum("eid,eij,ej->d", J, edges.info9, r)
        # bias prior
        Pm = jnp.zeros((D,)).at[0:3].set(prior_g_info).at[3:6].set(prior_a_info)
        H = JtWJ + jnp.diag(Pm)
        bvec = -JtWr - Pm * theta
        d = jnp.sqrt(jnp.clip(jnp.diag(H), 1e-10, None))
        Hn = H / d[:, None] / d[None, :]
        Hn = Hn + lam * jnp.diag(jnp.ones(D))
        dth = jnp.linalg.solve(Hn, bvec / d) / d
        if not estimate_scale:
            dth = dth.at[8].set(0.0)
        theta_new = theta + dth
        c_new = cost_of(theta_new)
        accept = c_new < best
        theta = jnp.where(accept, theta_new, theta)
        lam = jnp.where(accept, lam * 0.33, lam * 4.0)
        best = jnp.where(accept, c_new, best)
        return (theta, lam, best), c_new

    theta0 = jnp.zeros((D,)).at[9:].set(v0.reshape(-1))
    (theta, _, chi2), _ = jax.lax.scan(
        lm_iter, (theta0, jnp.float32(1e-4), cost_of(theta0)), None,
        length=iters,
    )
    bg, ba, g, s, v = unpack(theta)
    return VIInitResult(bias_g=bg, bias_a=ba, v=v, gravity=g, scale=s, chi2=chi2)
