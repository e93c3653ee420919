"""Distributed-GBA scaling proxy on virtual CPU devices (MULTICHIP notes).

Real multi-host TPU hardware is unavailable in this environment (one chip
behind a tunnel), so the committed scaling evidence is the prescribed
proxy: the SAME obs-sharded matrix-free PCG Schur program
(``parallel.dist_ba.distributed_bundle_adjust_cg``) timed on 1/2/4/8
virtual CPU devices (``--xla_force_host_platform_device_count``), checked
for numerical agreement with the single-device solver. Virtual devices
share one socket's memory bandwidth, so parallel efficiency here is a
LOWER bound on ICI-connected real chips (whose HBM scales with device
count); the number that matters is the communication-structure overhead:
psum volume per LM iteration is independent of device count.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python tools/dist_ba_efficiency.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.optim import ba, factors
from orb_slam3_detailed_comments_kor_tpu.parallel import dist_ba

K, L, OBS_PER, ITERS, CG = 128, 32768, 8, 4, 24


def make_problem(seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(-5, 5, (L, 3)), jnp.float32)
    R = jnp.tile(jnp.eye(3)[None], (K, 1, 1))
    t = jnp.asarray(rng.uniform(-1, 1, (K, 3)), jnp.float32)
    kf = jnp.asarray(rng.integers(0, K, (L * OBS_PER,)), jnp.int32)
    lm = jnp.asarray(np.repeat(np.arange(L), OBS_PER), jnp.int32)
    pc = X[lm] + t[kf]
    uv = 400.0 * pc[:, :2] / jnp.maximum(pc[:, 2:3], 0.5) + 300.0
    uv = uv + jnp.asarray(rng.normal(0, 0.5, uv.shape), jnp.float32)
    obs = factors.Observations(
        kf=kf, lm=lm, uv=uv, u_right=-jnp.ones((L * OBS_PER,)),
        inv_sigma2=jnp.ones((L * OBS_PER,)),
        valid=jnp.ones((L * OBS_PER,), bool),
    )
    cam = jnp.array([400.0, 400.0, 376.0, 240.0])
    fp = jnp.zeros((K,), bool).at[0].set(True)
    fl = jnp.zeros((L,), bool)
    return R, t, X, obs, fp, fl, cam


def timeit(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    R, t, X, obs, fp, fl, cam = make_problem()
    t1, ref = timeit(lambda: ba.bundle_adjust_cg(
        R, t, X, obs, fp, fl, cam, 45.0, iters=ITERS, cg_iters=CG,
    ))
    rows = [{"devices": 1, "ms": round(t1 * 1e3, 1), "speedup": 1.0,
             "efficiency": 1.0, "impl": "single-device jit"}]
    for n in (2, 4, 8):
        if n > len(jax.devices()):
            break
        mesh = dist_ba.make_mesh(n)
        tn, out = timeit(lambda m=mesh: dist_ba.distributed_bundle_adjust_cg(
            m, R, t, X, obs, fp, fl, cam, jnp.float32(45.0),
            iters=ITERS, cg_iters=CG,
        ))
        dx = float(jnp.max(jnp.abs(out[2] - ref.X)))
        rows.append({
            "devices": n, "ms": round(tn * 1e3, 1),
            "speedup": round(t1 / tn, 2),
            "efficiency": round(t1 / tn / n, 2),
            "max_dX_vs_single": round(dx, 6),
            "impl": "obs-sharded shard_map + psum",
        })
    res = {
        "problem": f"K={K} L={L} obs={L*OBS_PER} iters={ITERS} cg={CG}",
        "platform": jax.devices()[0].platform,
        "rows": rows,
    }
    print(json.dumps(res, indent=2))
    with open("MULTICHIP_EFFICIENCY.md", "w") as f:
        f.write(
            "# Distributed GBA scaling proxy (virtual CPU devices)\n\n"
            "Real multi-chip hardware is not available in this environment "
            "(single TPU chip behind a tunnel) — this is the committed "
            "proxy prescribed by VERDICT r2 #7: the production obs-sharded "
            "matrix-free PCG Schur GBA (`parallel/dist_ba.py`, the exact "
            "program `slam.loop_closing.global_ba` dispatches when "
            "`len(jax.devices()) > 1`) timed on XLA virtual CPU devices.\n\n"
            "Virtual devices SHARE one socket's memory bandwidth — the "
            "dominant resource for this bandwidth-bound solver — so "
            "wall-clock speedup here is a floor, not an estimate, for ICI-"
            "connected chips whose HBM scales with device count. The psum "
            "traffic per LM iteration (one [L,3,3] block reduce + "
            "cg·([L,3]+[K,6])) is independent of device count.\n\n"
            "```json\n" + json.dumps(res, indent=2) + "\n```\n\n"
            "Regenerate: `env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
            "PYTHONPATH=/root/repo python tools/dist_ba_efficiency.py`\n"
        )
    print("wrote MULTICHIP_EFFICIENCY.md")


if __name__ == "__main__":
    main()
