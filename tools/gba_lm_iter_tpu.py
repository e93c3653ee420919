"""Measure the single-chip GBA LM-iteration time (MULTICHIP_EFFICIENCY's
TPU_MS_PER_LM_ITER): the exact production PCG-Schur chunk program
(`optim.ba.bundle_adjust_cg`) on the dist_ba_efficiency problem shapes
(K=128, L=32768, 262k obs, cg=24), timed on the real chip.

Run (TPU, exclusive): python tools/gba_lm_iter_tpu.py

CAVEAT (round-4 finding): through the remote axon tunnel this printed
0.04 ms/LM-iter — ~30x BELOW the HBM bandwidth floor of the program
(~1 GB of A-block traffic per iteration → ≥1.2 ms at 819 GB/s), i.e.
``block_until_ready`` did not actually synchronize the timed dispatches.
Treat the output as valid only on a locally-attached chip; on the tunnel
use a value-dependent sync (np.asarray of an output scalar) instead.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.optim import ba
from tools.dist_ba_efficiency import CG, ITERS, make_problem


def main():
    R, t, X, obs, fp, fl, cam = make_problem()

    def dispatch(iters):
        return ba.bundle_adjust_cg(
            R, t, X, obs, fp, fl, cam, 0.0, iters=iters, cg_iters=CG
        )

    def vsync(res):
        # VALUE-dependent sync: through the axon tunnel
        # ``block_until_ready`` returned before the device finished (r4
        # printed 0.04 ms/LM-iter, ~30x below the kernel's HBM floor);
        # an actual device->host copy of an output element is the only
        # reliable barrier. TPU executes its queue in order, so syncing
        # the LAST rep's output bounds all previous dispatches too.
        np.asarray(jax.numpy.ravel(res.t_cw)[:1])

    vsync(dispatch(ITERS))  # compile + warm
    t0 = time.perf_counter()
    reps = 5
    res = None
    for _ in range(reps):
        res = dispatch(ITERS)
    vsync(res)
    dt = (time.perf_counter() - t0) / reps
    ms_per_iter = dt * 1e3 / ITERS
    comm_ms = 0.26  # analytic ICI model, MULTICHIP_EFFICIENCY.md
    ratio = comm_ms / ms_per_iter
    # D=8: per-device compute T/8, exposed comm constant
    eff8 = (ms_per_iter / 8) / (ms_per_iter / 8 + comm_ms)
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "problem": f"K=128 L=32768 obs=262144 cg={CG}",
        "tpu_ms_per_lm_iter": round(ms_per_iter, 2),
        "comm_ms_model": comm_ms,
        "comm_ratio": round(ratio, 4),
        "projected_eff_d8": round(eff8, 3),
    }))


if __name__ == "__main__":
    main()
