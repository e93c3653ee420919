"""Stage breakdown of the stereo-inertial bench workload (host-wall per
span): runs bench.py's SI sequence with the StageTimer enabled, in both
throughput mode and per-frame-blocking latency mode, and prints the span
reports so SI regressions can be attributed to a stage.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import bench
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem


def main(n_frames=130):
    params = jnp.array([bench.FX, bench.FX, bench.W / 2.0, bench.H / 2.0])
    scene = synthetic.default_scene()
    traj = synthetic.AnalyticTrajectory()
    frames, imu_pf = [], []
    for i in range(n_frames):
        t = i / bench.FPS
        R_wb, p_wb = traj.pose(t)
        il, ir, _ = synthetic.stereo_pair(
            params, R_wb, p_wb, bench.BASELINE, scene, h=bench.H, w=bench.W
        )
        frames.append((il.block_until_ready(), ir.block_until_ready()))
        samples = []
        if i > 0:
            t0s = (i - 1) / bench.FPS
            n = int(round((t - t0s) * bench.IMU_RATE))
            dt = (t - t0s) / n
            for k in range(n):
                tm = t0s + (k + 0.5) * dt
                acc, gyro = traj.imu_at(tm)
                samples.append(
                    (t0s + (k + 1) * dt, np.asarray(acc), np.asarray(gyro))
                )
        imu_pf.append(samples)

    cfg = bench.build_config(True)

    def run(system, block=False, label=None):
        lat = []
        for i in range(n_frames):
            t0 = time.perf_counter()
            system.track_stereo_inertial(
                frames[i][0], frames[i][1], i / bench.FPS, imu_pf[i]
            )
            if block:
                jax.block_until_ready(system.t_cw)
            lat.append((time.perf_counter() - t0) * 1e3)
        return np.array(lat)

    warm = SlamSystem(cfg)
    run(warm)
    warm.flush_decisions()
    jax.block_until_ready(warm.t_cw)
    del warm

    slam = SlamSystem(cfg)
    slam.timer.enabled = True
    t0 = time.time()
    run(slam)
    jax.block_until_ready(slam.t_cw)
    wall = time.time() - t0
    print("=== throughput mode ===")
    print(slam.timer.report(), flush=True)
    print(f"fps={n_frames / wall:.2f}  kf={slam.n_kf}  state={slam.state}")

    slam2 = SlamSystem(cfg)
    slam2.timer.enabled = True
    lat = run(slam2, block=True)
    print("\n=== latency mode (block per frame) ===")
    print(slam2.timer.report(), flush=True)
    lat5 = lat[5:]
    print(f"p50={np.percentile(lat5, 50):.1f} p90={np.percentile(lat5, 90):.1f} "
          f"p99={np.percentile(lat5, 99):.1f} max={lat5.max():.1f}")
    # the 10 slowest frames, with indices (IMU init / loop events show here)
    worst = np.argsort(lat)[-10:]
    print("worst frames:", [(int(i), round(float(lat[i]), 1)) for i in sorted(worst)])


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 130)
