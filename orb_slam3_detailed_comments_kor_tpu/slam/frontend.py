"""Per-frame front-end: one jitted program from pixels to features+depth.

Fuses what the reference spreads over the stereo ``Frame`` constructor
(``src/Frame.cc:98``: two extraction threads, undistortion, stereo matching,
grid binning) into a single XLA program: both views' ORB extraction, the
row-banded stereo matcher and SAD refine all share one compilation and one
device dispatch — the TPU analog of the reference's intra-frame thread
parallelism (SURVEY.md §2.4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.ops import orb as orb_ops
from orb_slam3_detailed_comments_kor_tpu.ops import pyramid as pyr_ops
from orb_slam3_detailed_comments_kor_tpu.ops import stereo as stereo_ops


class Frame(NamedTuple):
    """Working record for one (stereo) frame; all arrays capacity N."""

    xy: jnp.ndarray        # [N,2] float32
    level: jnp.ndarray     # [N] int32
    angle: jnp.ndarray     # [N] float32
    desc: jnp.ndarray      # [N,256] uint8 bits
    desc_packed: jnp.ndarray  # [N,8] uint32
    valid: jnp.ndarray     # [N] bool
    u_right: jnp.ndarray   # [N] float32 (-1 mono)
    depth: jnp.ndarray     # [N] float32 (-1 unknown)
    # matched RIGHT-camera pixel for rig (dual-fisheye) frames; x<0 → none.
    # None on rectified/mono paths (right-view info lives in u_right there).
    uv_r: Optional[jnp.ndarray] = None  # [N,2] float32

    @property
    def n(self) -> int:
        return self.xy.shape[0]


@functools.partial(
    jax.jit,
    static_argnames=("n_features", "n_levels", "scale", "cell"),
)
def process_stereo(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    bf: float,
    n_features: int = 1200,
    n_levels: int = 8,
    scale: float = 1.2,
    cell: int = 32,
) -> Frame:
    """imgs [H,W] float32 → Frame. One fused device program per shape.

    Both views go through ONE batched extraction (padded level stack) and
    the stereo matcher reuses that stack — the pyramid is built exactly
    once per view per frame.
    """
    feats, stack, patches = orb_ops.extract_orb_batch.__wrapped__(
        jnp.stack([img_l, img_r]),
        n_features=n_features, n_levels=n_levels, scale=scale, cell=cell,
        return_stack=True,
    )
    fl = jax.tree.map(lambda a: a[0], feats)
    fr = jax.tree.map(lambda a: a[1], feats)
    n = fl.xy.shape[0]
    sd = stereo_ops.compute_stereo_matches(
        fl, fr, stack[0], stack[1], bf, scale,
        level_hw=pyr_ops.level_shapes(
            img_l.shape[0], img_l.shape[1], n_levels, scale
        ),
        left_patches=patches[:n],
    )
    return Frame(
        xy=fl.xy,
        level=fl.level,
        angle=fl.angle,
        desc=fl.desc,
        desc_packed=orb_ops.pack_descriptors(fl.desc),
        valid=fl.valid,
        u_right=sd.u_right,
        depth=sd.depth,
    )


def _undistort_xy(xy, cam_params, dist):
    """Keypoint undistortion (``Frame::UndistortKeyPoints``, ``src/Frame.cc:
    733``): extraction runs on the RAW image; only the coordinates are
    mapped through the inverse radial-tangential model."""
    from orb_slam3_detailed_comments_kor_tpu.models import camera as cm

    fx, fy, cx, cy = cam_params[0], cam_params[1], cam_params[2], cam_params[3]
    xn = jnp.stack([(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy], axis=-1)
    xu = cm.undistort_radtan(jnp.asarray(dist, jnp.float32), xn)
    return jnp.stack([fx * xu[:, 0] + cx, fy * xu[:, 1] + cy], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("n_features", "n_levels", "scale", "cell",
                              "dist")
)
def process_rgbd(
    img: jnp.ndarray,
    depth_map: jnp.ndarray,
    bf: float,
    n_features: int = 1200,
    n_levels: int = 8,
    scale: float = 1.2,
    cell: int = 32,
    dist=None,
    cam_params=None,
) -> Frame:
    """RGB-D front-end (Frame RGB-D ctor, ``src/Frame.cc:201``): ORB on the
    gray image, depth sampled at each keypoint (raw coordinates), keypoints
    undistorted when ``dist`` is given, synthetic right-u u_r = u − bf/d
    (ComputeStereoFromRGBD semantics) so the whole stereo pipeline
    downstream is reused unchanged."""
    f = orb_ops.extract_orb(
        img, n_features=n_features, n_levels=n_levels, scale=scale, cell=cell
    )
    h, w = depth_map.shape
    xi = jnp.clip(jnp.round(f.xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(f.xy[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_map[yi, xi]
    xy = f.xy
    if dist is not None and any(abs(v) > 0 for v in dist):
        xy = _undistort_xy(xy, cam_params, dist)
    ok = f.valid & (d > 0.05)
    u_right = jnp.where(ok, xy[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    return Frame(
        xy=xy,
        level=f.level,
        angle=f.angle,
        desc=f.desc,
        desc_packed=orb_ops.pack_descriptors(f.desc),
        valid=f.valid,
        u_right=u_right,
        depth=jnp.where(ok, d, -1.0),
    )


@functools.partial(
    jax.jit, static_argnames=("n_features", "n_levels", "scale", "cell",
                              "dist")
)
def process_mono(
    img: jnp.ndarray,
    n_features: int = 1200,
    n_levels: int = 8,
    scale: float = 1.2,
    cell: int = 32,
    dist=None,
    cam_params=None,
) -> Frame:
    f = orb_ops.extract_orb(
        img, n_features=n_features, n_levels=n_levels, scale=scale, cell=cell
    )
    xy = f.xy
    if dist is not None and any(abs(v) > 0 for v in dist):
        xy = _undistort_xy(xy, cam_params, dist)
    n = f.xy.shape[0]
    return Frame(
        xy=xy,
        level=f.level,
        angle=f.angle,
        desc=f.desc,
        desc_packed=orb_ops.pack_descriptors(f.desc),
        valid=f.valid,
        u_right=-jnp.ones((n,)),
        depth=-jnp.ones((n,)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_features", "n_levels", "scale", "cell"),
)
def process_stereo_fisheye(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    params_l: jnp.ndarray,
    params_r: jnp.ndarray,
    R_rl: jnp.ndarray,
    t_rl: jnp.ndarray,
    n_features: int = 1200,
    n_levels: int = 8,
    scale: float = 1.2,
    cell: int = 32,
) -> Frame:
    """Dual-fisheye (KannalaBrandt8 x2) stereo front-end.

    Counterpart of the stereo-fisheye Frame constructor
    (``src/Frame.cc:1021``) and its descriptor-matcher + triangulation
    depth path (``Frame.cc:1119`` → ``KannalaBrandt8::TriangulateMatches``,
    ``KannalaBrandt8.cpp:338``): the two raw fisheye views are NOT
    rectified; left/right association is a descriptor nearest-neighbour
    match and depth comes from two-view midpoint triangulation through the
    calibrated extrinsic (R_rl, t_rl — left→right).

    Matched points carry metric ``depth`` on the LEFT frame (spawning
    scale-true landmarks) AND the matched right-camera pixel in ``uv_r``:
    downstream pose optimization / BA add an independent right-camera mono
    residual through the rig extrinsic per matched feature — the analog of
    the reference's dedicated right-camera edges (``OptimizableTypes.h``
    ToBody variants) without a second feature table.
    """
    from orb_slam3_detailed_comments_kor_tpu.models import camera as cam_mod
    from orb_slam3_detailed_comments_kor_tpu.ops import (
        matching as match_ops, twoview,
    )

    feats = orb_ops.extract_orb_batch.__wrapped__(
        jnp.stack([img_l, img_r]),
        n_features=n_features, n_levels=n_levels, scale=scale, cell=cell,
    )
    fl = jax.tree.map(lambda a: a[0], feats)
    fr = jax.tree.map(lambda a: a[1], feats)

    res = match_ops.match_nn_ratio(
        fl.desc, fr.desc, fl.valid, fr.valid, max_dist=50, ratio=0.8
    )
    ridx = jnp.clip(res.idx, 0)
    rays_l = cam_mod.kb8_unproject(params_l, fl.xy)
    rays_r = cam_mod.kb8_unproject(params_r, fr.xy)[ridx]
    X_l, dep_l, dep_r = twoview.triangulate_midpoint(
        R_rl, t_rl, rays_l, rays_r
    )
    # TriangulateMatches gates: cheirality both views, parallax, and
    # reprojection error in both cameras at the feature's scale sigma
    uv_l = cam_mod.kb8_project(params_l, X_l)
    X_r = X_l @ R_rl.T + t_rl
    uv_r = cam_mod.kb8_project(params_r, X_r)
    err_l = jnp.linalg.norm(uv_l - fl.xy, axis=-1)
    err_r = jnp.linalg.norm(uv_r - fr.xy[ridx], axis=-1)
    sigma = scale ** fl.level.astype(jnp.float32)
    rl_n = rays_l / jnp.maximum(
        jnp.linalg.norm(rays_l, axis=-1, keepdims=True), 1e-9
    )
    rr_in_l = rays_r @ R_rl  # right rays expressed in the left frame
    rr_n = rr_in_l / jnp.maximum(
        jnp.linalg.norm(rr_in_l, axis=-1, keepdims=True), 1e-9
    )
    cos_par = jnp.sum(rl_n * rr_n, axis=-1)
    ok = (
        res.valid
        & (dep_l > 0.05) & (dep_r > 0.05)
        & (err_l < 2.45 * sigma) & (err_r < 2.45 * sigma)
        & (cos_par < 0.9998)
    )
    d = jnp.where(ok, X_l[:, 2], -1.0)
    uv_r = jnp.where(ok[:, None], fr.xy[ridx], -1.0)
    return Frame(
        xy=fl.xy,
        level=fl.level,
        angle=fl.angle,
        desc=fl.desc,
        desc_packed=orb_ops.pack_descriptors(fl.desc),
        valid=fl.valid,
        u_right=-jnp.ones((fl.xy.shape[0],), jnp.float32),
        depth=d,
        uv_r=uv_r,
    )
