"""Benchmark: tracked frames/s on one TPU chip, EuRoC-like workload.

Renders a synthetic stereo sequence at EuRoC resolution (480x752), feeds the
full SLAM pipeline (fused ORB front-end + two-stage tracking + keyframe /
local-BA lifecycle) and reports steady-state tracked frames per second.

Baseline: the reference tracks at sensor rate (20 fps EuRoC) on a desktop
i7 (BASELINE.md); vs_baseline = fps / 20.0, target >= 2.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from orb_slam3_detailed_comments_kor_tpu.config import (
        CameraConfig, CapacityConfig, ORBConfig, SLAMConfig, TrackingConfig,
    )
    from orb_slam3_detailed_comments_kor_tpu.io import synthetic
    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

    H, W = 480, 752
    FX, BASELINE = 458.0, 0.11
    cfg = SLAMConfig(
        camera=CameraConfig(
            width=W, height=H, fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
            bf=BASELINE * FX,
        ),
        orb=ORBConfig(n_features=1200, cell_size=32),
        capacity=CapacityConfig(
            max_keyframes=64, max_landmarks=16384, max_local_landmarks=4096
        ),
        tracking=TrackingConfig(max_frames_between_kf=10),
    )
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    n_frames = 130
    Rs, ts = synthetic.make_trajectory(n_frames, motion="strafe", speed=0.03)

    # pre-render all frames (rendering is not part of the benchmark)
    frames = []
    for i in range(n_frames):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        frames.append((il.block_until_ready(), ir.block_until_ready()))

    # Two passes over the SAME sequence: pass 1 (throwaway system) drives
    # every code path that jit-compiles — tracking, KF insertion, local BA,
    # culling, loop detect/verify/correct — so the timed pass hits only the
    # in-process executable cache. Remote/axon compiles are tens of seconds
    # and must not land in the timed window.
    warm = SlamSystem(cfg)
    for i in range(n_frames):
        warm.track_stereo(frames[i][0], frames[i][1], i / 20.0)
    warm.flush_decisions()
    jax.block_until_ready(warm.t_cw)
    del warm

    slam = SlamSystem(cfg)
    t0 = time.time()
    for i in range(n_frames):
        slam.track_stereo(frames[i][0], frames[i][1], i / 20.0)
    jax.block_until_ready(slam.t_cw)
    wall = time.time() - t0
    fps = n_frames / wall

    # sanity: tracking must actually work for the number to count
    from orb_slam3_detailed_comments_kor_tpu.eval import ate

    _, centers, _ = slam.trajectory_arrays()
    rmse = ate.ate_rmse(centers, ts[: len(centers)])
    ok = slam.state == 1 and rmse < 0.15

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_second_1chip",
                "value": round(fps, 2) if ok else 0.0,
                "unit": "fps",
                "vs_baseline": round(fps / 20.0, 3) if ok else 0.0,
                "ate_m": round(rmse, 4),
                "state": slam.state,
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
