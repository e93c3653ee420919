"""TPU-native visual-inertial SLAM engine.

A brand-new JAX / XLA / Pallas implementation of the capability set of
ORB-SLAM3 (reference: the Korean-commented study fork
``Taeyoung96/ORB_SLAM3_detailed_comments_KOR``): monocular / stereo / RGB-D /
visual-inertial tracking, pinhole + fisheye camera models, ORB feature
extraction and Hamming matching, a multi-map Atlas with place recognition,
loop closing and map merging, and a Levenberg-Marquardt bundle-adjustment
back-end with Schur-complement landmark elimination — all built TPU-first:
fixed-capacity SoA device state, masked static shapes, batched kernels.

Nothing in here is a translation of the reference's C++; the reference defines
*what* (see SURVEY.md), this package defines *how* for TPUs.
"""

__version__ = "0.1.0"

from orb_slam3_detailed_comments_kor_tpu.config import (  # noqa: F401
    CameraConfig,
    IMUConfig,
    ORBConfig,
    SLAMConfig,
    TrackingConfig,
)
