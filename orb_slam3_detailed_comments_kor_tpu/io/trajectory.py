"""Trajectory writers: TUM / EuRoC / KITTI formats.

Counterpart of the reference's ``System::SaveTrajectoryTUM`` /
``SaveTrajectoryEuRoC`` / ``SaveTrajectoryKITTI`` (``src/System.cc:410-842``).
Input is (times [T], R_wc [T,3,3], centers t_wc [T,3]) — the camera-to-world
trajectory the evaluator consumes.
"""

from __future__ import annotations

import numpy as np

from orb_slam3_detailed_comments_kor_tpu.utils import lie


def _quats_wxyz(R_wc: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(lie.rotmat_to_quat(jnp.asarray(R_wc)))


def save_tum(path: str, times, centers, R_wc) -> None:
    """TUM format: `time x y z qx qy qz qw` (System::SaveTrajectoryTUM)."""
    q = _quats_wxyz(R_wc)  # (w,x,y,z)
    with open(path, "w") as f:
        for i in range(len(times)):
            f.write(
                f"{times[i]:.6f} {centers[i,0]:.7f} {centers[i,1]:.7f} "
                f"{centers[i,2]:.7f} {q[i,1]:.7f} {q[i,2]:.7f} {q[i,3]:.7f} "
                f"{q[i,0]:.7f}\n"
            )


def save_euroc(path: str, times, centers, R_wc) -> None:
    """EuRoC format: `time_ns, x, y, z, qw, qx, qy, qz`
    (System::SaveTrajectoryEuRoC, ``System.cc:503``)."""
    q = _quats_wxyz(R_wc)
    with open(path, "w") as f:
        for i in range(len(times)):
            f.write(
                f"{int(times[i]*1e9)},{centers[i,0]:.7f},{centers[i,1]:.7f},"
                f"{centers[i,2]:.7f},{q[i,0]:.7f},{q[i,1]:.7f},{q[i,2]:.7f},"
                f"{q[i,3]:.7f}\n"
            )


def save_kitti(path: str, times, centers, R_wc) -> None:
    """KITTI format: 12 numbers per row, row-major [R|t]
    (System::SaveTrajectoryKITTI)."""
    with open(path, "w") as f:
        for i in range(len(times)):
            T = np.concatenate([R_wc[i], centers[i][:, None]], axis=1)
            f.write(" ".join(f"{v:.7e}" for v in T.reshape(-1)) + "\n")


def load_tum(path: str):
    """Load a TUM-format trajectory -> (times [T], centers [T,3], quat_xyzw)."""
    data = np.loadtxt(path)
    return data[:, 0], data[:, 1:4], data[:, 4:8]
