"""Speed-of-light accounting for the three dominant kernels (PERF.md).

For each kernel: measured wall time on the real chip, an op/byte count
derived from the kernel's actual shapes, achieved FLOP/s and bytes/s, and
the fraction of the chip's peak — plus what eats the gap. BASELINE.md's
"BA and matching kernels at speed-of-light per chip" target is checked
against these numbers.

Peaks used (TPU v5e / "v5 lite", public spec): 197 TFLOP/s bf16 MXU,
~49 TFLOP/s f32-accumulated matmul (bf16 operands, f32 accumulate at 1/4
issue), 819 GB/s HBM.

Run (TPU, exclusive): PYTHONPATH=/root/.axon_site:/root/repo \
    python tools/perf_sol.py
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12
PEAK_F32 = 49e12
PEAK_HBM = 819e9

H, W, NF = 480, 752, 1200


def _vsync(out):
    # VALUE-dependent sync: through the axon tunnel ``block_until_ready``
    # can return before the device finishes (r4: gba_lm_iter printed 30x
    # below the kernel's HBM floor); copying one output element to host is
    # the reliable barrier, and the in-order device queue makes the last
    # dispatch bound all earlier ones.
    leaf = [l for l in jax.tree.leaves(out) if hasattr(l, "shape")][0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, reps=20):
    out = fn(*args)
    _vsync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _vsync(out)
    return (time.perf_counter() - t0) / reps


def bench_matcher():
    """Pallas fused Hamming best-2: N=1200 x M=4096 x 256 bits."""
    from orb_slam3_detailed_comments_kor_tpu.ops import pallas_matching as pm

    rng = np.random.default_rng(0)
    N, M = 1280, 4096
    a = jnp.asarray(rng.integers(0, 2, (N, 256)), jnp.float32)
    b = jnp.asarray(rng.integers(0, 2, (M, 256)), jnp.float32)
    mask = jnp.ones((N, M), jnp.float32)
    t = timeit(lambda: pm.fused_masked_best2(a, b, mask))
    flops = 2.0 * N * M * 256  # the distance dot_general (dominant)
    bytes_moved = 4.0 * (N * 256 + M * 256 + N * M)  # a, b, mask (mask
    # streams from HBM once; distances stay in VMEM by design)
    return {
        "kernel": "hamming_best2 (pallas)",
        "shape": f"[{N}x256]x[{M}x256]+mask",
        "ms": round(t * 1e3, 3),
        "achieved_tflops": round(flops / t / 1e12, 2),
        "pct_peak_f32_mxu": round(100 * flops / t / PEAK_F32, 1),
        "achieved_GBps": round(bytes_moved / t / 1e9, 1),
        "pct_peak_hbm": round(100 * bytes_moved / t / PEAK_HBM, 1),
    }


def bench_frontend():
    """Stereo front-end: 2x ORB pyramid extraction + stereo match."""
    from orb_slam3_detailed_comments_kor_tpu.slam import frontend

    rng = np.random.default_rng(1)
    il = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    ir = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    t = timeit(lambda: frontend.process_stereo(il, ir, 45.0,
                                               n_features=NF))
    # byte floor: both views' full pyramids read+written once per stage
    # through ~4 stages (blur, FAST scores, NMS, orientation/descriptor
    # patch gather) — a LOWER bound on HBM traffic
    pyr_px = sum(int(H * W * (1 / 1.2 ** (2 * l))) for l in range(8))
    bytes_moved = 2 * pyr_px * 4.0 * 2 * 4
    return {
        "kernel": "stereo front-end (pyramid+FAST+rBRIEF+stereo match)",
        "shape": f"2x[{H}x{W}] -> {NF} feats",
        "ms": round(t * 1e3, 3),
        "byte_floor_GB": round(bytes_moved / 1e9, 4),
        "achieved_GBps_floor": round(bytes_moved / t / 1e9, 1),
        "pct_peak_hbm": round(100 * bytes_moved / t / PEAK_HBM, 1),
    }


def bench_pcg():
    """One GBA-scale LM iteration of the matrix-free PCG Schur solver."""
    from orb_slam3_detailed_comments_kor_tpu.optim import ba, factors

    rng = np.random.default_rng(2)
    K, L, OBS_PER = 128, 32768, 8
    O = L * OBS_PER
    X = jnp.asarray(rng.uniform(-5, 5, (L, 3)), jnp.float32)
    R = jnp.tile(jnp.eye(3)[None], (K, 1, 1))
    tt = jnp.asarray(rng.uniform(-1, 1, (K, 3)), jnp.float32)
    kf = jnp.asarray(rng.integers(0, K, (O,)), jnp.int32)
    lm = jnp.asarray(np.repeat(np.arange(L), OBS_PER), jnp.int32)
    pc = X[lm] @ jnp.eye(3) + tt[kf]
    uv = 400.0 * pc[:, :2] / jnp.maximum(pc[:, 2:], 0.5)[..., :1] + 300.0
    obs = factors.Observations(
        kf=kf, lm=lm, uv=uv, u_right=-jnp.ones((O,)),
        inv_sigma2=jnp.ones((O,)), valid=jnp.ones((O,), bool),
    )
    cam = jnp.array([400.0, 400.0, 376.0, 240.0])
    fixed_p = jnp.zeros((K,), bool).at[0].set(True)
    fixed_l = jnp.zeros((L,), bool)
    CG_ITERS = 24

    def run():
        return ba.bundle_adjust_cg(
            R, tt, X, obs, fixed_p, fixed_l, cam, 45.0,
            iters=1, cg_iters=CG_ITERS,
        )

    t = timeit(run, reps=5)
    # dominant traffic: per CG iteration two obs-sized gather+scatter
    # passes over the A blocks [O,6,3] + residual/Jacobian eval once
    a_bytes = O * 18 * 4.0
    cg_bytes = CG_ITERS * 2 * (a_bytes + O * (6 + 3) * 4.0)
    jac_bytes = O * (18 + 18 + 9 + 3) * 4.0  # Jp, Jl, blocks, r
    bytes_moved = cg_bytes + jac_bytes
    return {
        "kernel": "PCG Schur LM iteration (GBA scale)",
        "shape": f"K={K} L={L} obs={O} cg={CG_ITERS}",
        "ms": round(t * 1e3, 3),
        "byte_floor_GB": round(bytes_moved / 1e9, 3),
        "achieved_GBps_floor": round(bytes_moved / t / 1e9, 1),
        "pct_peak_hbm": round(100 * bytes_moved / t / PEAK_HBM, 1),
    }


def main():
    dev = jax.devices()[0]
    results = {
        "platform": dev.platform,
        "device": str(dev.device_kind),
        "peaks": {"bf16_tflops": 197, "f32_mxu_tflops": 49,
                  "hbm_GBps": 819},
        "kernels": [bench_matcher(), bench_frontend(), bench_pcg()],
    }
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
