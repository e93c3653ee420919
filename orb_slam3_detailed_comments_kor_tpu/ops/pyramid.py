"""Image pyramid + separable Gaussian blur.

TPU-native counterpart of ``ORBextractor::ComputePyramid``
(reference ``src/ORBextractor.cc:1152``) and the pre-descriptor
``GaussianBlur(7,7,2,2)`` (``ORBextractor.cc:1110``).  The pyramid is a
fixed 8-element pytree of float32 images (one shape per level — static under
jit); resampling is bilinear, matching cv::resize(INTER_LINEAR) semantics
closely enough for feature work.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp


def level_shapes(h: int, w: int, n_levels: int, scale: float) -> List[Tuple[int, int]]:
    """Static per-level (H, W). Matches cv::round(h / scale^l)."""
    out = []
    for l in range(n_levels):
        inv = 1.0 / (scale ** l)
        out.append((int(round(h * inv)), int(round(w * inv))))
    return out


def resize_weights(in_size: int, out_size: int):
    """[out_size, in_size] banded triangle-filter matrix replicating
    ``jax.image.resize(method="linear", antialias=True)`` along one axis.

    Resize-as-matmul rides the MXU; the gather/conv lowering of
    jax.image.resize measured ~5 ms/frame for the 8-level stereo pyramid,
    the two band matmuls ~1 ms (same math: separable triangle kernel
    scaled by the downsampling factor, renormalized at the edges).
    """
    import numpy as np

    try:
        # use jax's own weight builder so the matmul path is numerically
        # IDENTICAL to jax.image.resize (downstream FAST thresholds sit
        # close enough to corner responses that even ~2e-5 weight drift
        # changed keypoint selection measurably on the synthetic suite)
        from jax._src.image import scale as _jscale

        kern = _jscale._kernels[_jscale.ResizeMethod.LINEAR]
        w = _jscale.compute_weight_mat(
            in_size, out_size, out_size / in_size, 0.0, kern, True
        )
        return np.asarray(w, np.float32).T
    except Exception:  # private API moved: equivalent explicit formula
        scale = out_size / in_size
        sample_f = (np.arange(out_size) + 0.5) / scale - 0.5
        kscale = min(scale, 1.0)  # antialias: widen kernel when shrinking
        x = np.abs(sample_f[:, None] - np.arange(in_size)[None, :]) * kscale
        w = np.maximum(0.0, 1.0 - x)
        w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        return w.astype(np.float32)


def resize_matmul(img: jnp.ndarray, h_out: int, w_out: int) -> jnp.ndarray:
    """Separable linear+antialias resize of [..., H, W] via two matmuls."""
    h_in, w_in = img.shape[-2], img.shape[-1]
    A = jnp.asarray(resize_weights(h_in, h_out))
    B = jnp.asarray(resize_weights(w_in, w_out))
    # precision=highest matches jax.image.resize's internal einsums (f32
    # accumulation on MXU); these matmuls are tiny, the cost is noise
    out = jnp.einsum("oh,...hw->...ow", A, img, precision="highest")
    return jnp.einsum("...ow,pw->...op", out, B, precision="highest")


def build_pyramid(img: jnp.ndarray, n_levels: int, scale: float) -> List[jnp.ndarray]:
    """img [H,W] float32 -> list of n_levels images, level l scaled by scale^-l.

    Each level is resized from the previous one (as the reference does), not
    from level 0, so the effective low-pass accumulates similarly.
    """
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    levels = [img]
    for l in range(1, n_levels):
        prev = levels[-1]
        levels.append(
            jax.image.resize(prev, shapes[l], method="linear", antialias=True)
        )
    return levels


def _gauss_kernel(ksize: int, sigma: float) -> jnp.ndarray:
    r = (ksize - 1) / 2
    x = jnp.arange(ksize, dtype=jnp.float32) - r
    k = jnp.exp(-(x * x) / (2 * sigma * sigma))
    return k / k.sum()


@functools.partial(jax.jit, static_argnames=("ksize",))
def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with reflect padding, [...,H,W] -> [...,H,W]
    (batch dims pass through)."""
    k = _gauss_kernel(ksize, sigma)
    r = ksize // 2
    lead = [(0, 0)] * (img.ndim - 2)
    ay, ax = img.ndim - 2, img.ndim - 1
    p = jnp.pad(img, lead + [(r, r), (0, 0)], mode="reflect")
    # vertical pass
    v = jnp.zeros_like(img)
    for i in range(ksize):
        v = v + k[i] * jax.lax.dynamic_slice_in_dim(p, i, img.shape[ay], axis=ay)
    p = jnp.pad(v, lead + [(0, 0), (r, r)], mode="reflect")
    h = jnp.zeros_like(img)
    for i in range(ksize):
        h = h + k[i] * jax.lax.dynamic_slice_in_dim(p, i, img.shape[ax], axis=ax)
    return h
