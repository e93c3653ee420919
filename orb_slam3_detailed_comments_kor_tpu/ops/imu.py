"""On-manifold IMU preintegration (Forster et al. TRO'17) as a lax.scan.

TPU-native counterpart of ``IMU::Preintegrated``
(``include/ImuTypes.h:155-267``, ``src/ImuTypes.cc:224-335``): ΔR/ΔV/ΔP
accumulation, 9x9 covariance propagation (φ, v, p) and the five bias
Jacobians (JRg, JVg, JVa, JPg, JPa) that let factors correct for small bias
updates without reintegration.  The raw measurement batch is kept (fixed
capacity + mask), so ``reintegrate`` on a large bias change is just re-running
the scan — the functional analog of the reference's measurement log +
``Reintegrate()``.

Conventions: gravity is handled by the consumer (residuals subtract g·Δt in
world frame); measurements are body-frame specific force + angular rate.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.utils import lie


class ImuBatch(NamedTuple):
    """Fixed-capacity IMU measurement window (between two frames/KFs)."""

    acc: jnp.ndarray   # [M,3]
    gyro: jnp.ndarray  # [M,3]
    dt: jnp.ndarray    # [M]
    valid: jnp.ndarray  # [M] bool


class Preintegrated(NamedTuple):
    dt: jnp.ndarray    # scalar total time
    dR: jnp.ndarray    # [3,3]
    dV: jnp.ndarray    # [3]
    dP: jnp.ndarray    # [3]
    cov: jnp.ndarray   # [9,9] for (φ, v, p)
    JRg: jnp.ndarray   # [3,3] ∂ΔR/∂bg
    JVg: jnp.ndarray   # [3,3]
    JVa: jnp.ndarray   # [3,3]
    JPg: jnp.ndarray   # [3,3]
    JPa: jnp.ndarray   # [3,3]
    bias_g: jnp.ndarray  # [3] linearization gyro bias
    bias_a: jnp.ndarray  # [3] linearization acc bias


def identity_preintegrated() -> Preintegrated:
    return Preintegrated(
        dt=jnp.float32(0.0),
        dR=jnp.eye(3),
        dV=jnp.zeros(3),
        dP=jnp.zeros(3),
        cov=jnp.zeros((9, 9)),
        JRg=jnp.zeros((3, 3)),
        JVg=jnp.zeros((3, 3)),
        JVa=jnp.zeros((3, 3)),
        JPg=jnp.zeros((3, 3)),
        JPa=jnp.zeros((3, 3)),
        bias_g=jnp.zeros(3),
        bias_a=jnp.zeros(3),
    )


def integrate(
    batch: ImuBatch,
    bias_g: jnp.ndarray,
    bias_a: jnp.ndarray,
    sigma_g: float,
    sigma_a: float,
) -> Preintegrated:
    """Integrate a measurement batch at the given bias linearization point.

    Mirrors IntegrateNewMeasurement (``ImuTypes.cc:254``): per sample,
      dP += dV·dt + ½·dR·a·dt²;  dV += dR·a·dt;  dR ← dR·Exp(w·dt)
    with covariance propagated through the standard A/B system and bias
    Jacobians updated recursively.  Gyro/acc noise are continuous-time
    densities already scaled by √freq by the caller (IMU::Calib convention).
    """
    Ng = (sigma_g ** 2) * jnp.eye(3)
    Na = (sigma_a ** 2) * jnp.eye(3)

    def step(carry, x):
        pre = carry
        acc, gyro, dt, valid = x
        dt = jnp.where(valid, dt, 0.0)
        a = acc - bias_a
        w = gyro - bias_g
        dt2 = dt * dt
        dRa = pre.dR @ a

        # position/velocity first (use pre-update dR: mid-of-step convention)
        dP = pre.dP + pre.dV * dt + 0.5 * dRa * dt2
        dV = pre.dV + dRa * dt

        # covariance propagation (Forster eq. A.7-A.9 / ImuTypes.cc:278-311)
        dRk = lie.so3_exp(w * dt)
        Jr = lie.so3_right_jacobian(w * dt)
        a_hat = lie.hat(a)
        A = jnp.zeros((9, 9))
        A = A.at[0:3, 0:3].set(dRk.T)
        A = A.at[3:6, 0:3].set(-pre.dR @ a_hat * dt)
        A = A.at[6:9, 0:3].set(-0.5 * pre.dR @ a_hat * dt2)
        A = A.at[3:6, 3:6].set(jnp.eye(3))
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        A = A.at[6:9, 6:9].set(jnp.eye(3))
        B = jnp.zeros((9, 6))
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(pre.dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * pre.dR * dt2)
        Q = jnp.zeros((6, 6)).at[0:3, 0:3].set(Ng / jnp.maximum(dt, 1e-9))
        Q = Q.at[3:6, 3:6].set(Na / jnp.maximum(dt, 1e-9))
        cov = A @ pre.cov @ A.T + B @ Q @ B.T
        cov = jnp.where(valid, cov, pre.cov)

        # bias Jacobians (ImuTypes.cc:313-320)
        JPa = pre.JPa + pre.JVa * dt - 0.5 * pre.dR * dt2
        JPg = pre.JPg + pre.JVg * dt - 0.5 * pre.dR @ a_hat @ pre.JRg * dt2
        JVa = pre.JVa - pre.dR * dt
        JVg = pre.JVg - pre.dR @ a_hat @ pre.JRg * dt
        JRg = dRk.T @ pre.JRg - Jr * dt

        dR = pre.dR @ dRk
        new = Preintegrated(
            dt=pre.dt + dt, dR=dR, dV=dV, dP=dP, cov=cov,
            JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
            bias_g=bias_g, bias_a=bias_a,
        )
        # freeze state entirely for invalid samples
        new = jax.tree.map(
            lambda n, o: jnp.where(valid, n, o), new, pre
        )
        return new, None

    init = identity_preintegrated()._replace(bias_g=bias_g, bias_a=bias_a)
    out, _ = jax.lax.scan(
        step, init, (batch.acc, batch.gyro, batch.dt, batch.valid)
    )
    # renormalize rotation
    return out._replace(dR=lie.project_to_so3(out.dR))


def bias_corrected_delta(
    pre: Preintegrated, bias_g: jnp.ndarray, bias_a: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """First-order bias-corrected (ΔR, ΔV, ΔP) (GetDeltaRotation/...).

    δb = new bias − linearization bias (``ImuTypes.cc:340-365``).
    """
    dbg = bias_g - pre.bias_g
    dba = bias_a - pre.bias_a
    dR = pre.dR @ lie.so3_exp(pre.JRg @ dbg)
    dV = pre.dV + pre.JVg @ dbg + pre.JVa @ dba
    dP = pre.dP + pre.JPg @ dbg + pre.JPa @ dba
    return dR, dV, dP


def predict_state(
    pre: Preintegrated,
    R_wb: jnp.ndarray,
    p_wb: jnp.ndarray,
    v_w: jnp.ndarray,
    bias_g: jnp.ndarray,
    bias_a: jnp.ndarray,
    gravity: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dead-reckon the next body state (Tracking::PredictStateIMU,
    ``Tracking.cc:1561``). Returns (R_wb', p_wb', v_w')."""
    dR, dV, dP = bias_corrected_delta(pre, bias_g, bias_a)
    t = pre.dt
    R2 = R_wb @ dR
    v2 = v_w + gravity * t + R_wb @ dV
    p2 = p_wb + v_w * t + 0.5 * gravity * t * t + R_wb @ dP
    return R2, p2, v2


def merge(pre1: Preintegrated, batch2: ImuBatch, sigma_g, sigma_a) -> Preintegrated:
    """Append a second measurement batch (MergePrevious analog) by
    integrating it on top of pre1's bias and composing the deltas."""
    pre2 = integrate(batch2, pre1.bias_g, pre1.bias_a, sigma_g, sigma_a)
    return compose(pre1, pre2)


def compose(p1: Preintegrated, p2: Preintegrated) -> Preintegrated:
    """Compose two consecutive preintegrations with the same bias point."""
    dt = p1.dt + p2.dt
    dR = p1.dR @ p2.dR
    dV = p1.dV + p1.dR @ p2.dV
    dP = p1.dP + p1.dV * p2.dt + p1.dR @ p2.dP
    # covariance: transport p2's cov through p1 frame + p1 cov propagated
    # (approximate: add transported covariances; exact A-chaining is done by
    # re-integration when it matters)
    T = jnp.zeros((9, 9))
    T = T.at[0:3, 0:3].set(p2.dR.T @ jnp.eye(3))
    T = T.at[3:6, 3:6].set(jnp.eye(3))
    T = T.at[6:9, 6:9].set(jnp.eye(3))
    T = T.at[6:9, 3:6].set(jnp.eye(3) * p2.dt)
    cov = T @ p1.cov @ T.T + p2.cov
    return Preintegrated(
        dt=dt, dR=dR, dV=dV, dP=dP, cov=cov,
        JRg=p2.dR.T @ p1.JRg + p2.JRg,  # first-order composition
        JVg=p1.JVg + p1.dR @ p2.JVg,
        JVa=p1.JVa + p1.dR @ p2.JVa,
        JPg=p1.JPg + p1.JVg * p2.dt + p1.dR @ p2.JPg,
        JPa=p1.JPa + p1.JVa * p2.dt + p1.dR @ p2.JPa,
        bias_g=p1.bias_g, bias_a=p1.bias_a,
    )


# jitted entry points for the per-frame incremental path (each eager op
# through the remote tunnel is a separate dispatch; these make one each)
integrate_j = jax.jit(integrate)
compose_j = jax.jit(compose)
