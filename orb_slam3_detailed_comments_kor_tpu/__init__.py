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

import jax as _jax

# TPU matmuls default to bf16 inputs; the BA normal equations and Lie/camera
# einsums need true f32 (bf16's 8-bit mantissa destroys LM convergence —
# observed as tracking loss on-chip). Ops that are exact in bf16 (the 0/1
# Hamming popcount matmuls) opt back in explicitly with Precision.DEFAULT.
_jax.config.update("jax_default_matmul_precision", "float32")

from orb_slam3_detailed_comments_kor_tpu.config import (  # noqa: F401
    CameraConfig,
    IMUConfig,
    ORBConfig,
    SLAMConfig,
    TrackingConfig,
)
