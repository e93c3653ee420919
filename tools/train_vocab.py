"""Pretrain the default BoW vocabulary asset (k=10, depth=5 → 100k words).

The reference ships a ~1M-word DBoW2 vocabulary trained on Flickr images
(stripped from the repo). With zero egress, the corpus here is varied
SYNTHETIC imagery: the lattice-textured scene from many viewpoints/scales
plus procedural texture images (value noise, checkers, polygons, dot
grids, warped checkers) for descriptor diversity. 100k words measurably
separate a 512-place held-out database (models/VOCAB_EVAL.md; the
reference's 1M words serve city-scale corpora).

Run on CPU:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
             PYTHONPATH=/root/repo python tools/train_vocab.py
Writes orb_slam3_detailed_comments_kor_tpu/models/default_vocab.npz.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.models import vocabulary as voc
from orb_slam3_detailed_comments_kor_tpu.ops import orb as orb_ops
from orb_slam3_detailed_comments_kor_tpu.utils import lie

H, W, FX = 240, 376, 230.0
K_BRANCH, DEPTH = 10, 5


def value_noise(rng, h, w, octaves=4):
    img = np.zeros((h, w), np.float32)
    for o in range(octaves):
        s = 2 ** (o + 2)
        g = rng.rand(h // s + 2, w // s + 2).astype(np.float32)
        yy = np.linspace(0, g.shape[0] - 1.001, h)
        xx = np.linspace(0, g.shape[1] - 1.001, w)
        yi, xi = np.floor(yy).astype(int), np.floor(xx).astype(int)
        fy, fx = (yy - yi)[:, None], (xx - xi)[None, :]
        img += (1.0 / (o + 1)) * (
            g[yi][:, xi] * (1 - fy) * (1 - fx)
            + g[yi + 1][:, xi] * fy * (1 - fx)
            + g[yi][:, xi + 1] * (1 - fy) * fx
            + g[yi + 1][:, xi + 1] * fy * fx
        )
    img -= img.min()
    return 255.0 * img / max(img.max(), 1e-6)


def checker(rng, h, w):
    sy, sx = rng.randint(8, 40), rng.randint(8, 40)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 255.0 * (((yy // sy) + (xx // sx)) % 2).astype(np.float32)
    # soften + add noise so FAST fires on varied corners
    img = 0.8 * img + 40 * rng.rand(h, w).astype(np.float32)
    return img


def polygons(rng, h, w):
    """Random filled convex quads + line segments (man-made-structure
    proxy: corners at many orientations/contrasts)."""
    img = 60.0 + 20.0 * rng.rand(h, w).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(rng.randint(8, 20)):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        n_v = 4
        ang = np.sort(rng.uniform(0, 2 * np.pi, n_v))
        rad = rng.uniform(8, 45, n_v)
        val = rng.uniform(0, 255)
        inside = np.ones((h, w), bool)
        for i in range(n_v):
            y0, x0 = cy + rad[i] * np.sin(ang[i]), cx + rad[i] * np.cos(ang[i])
            j = (i + 1) % n_v
            y1, x1 = cy + rad[j] * np.sin(ang[j]), cx + rad[j] * np.cos(ang[j])
            inside &= ((x1 - x0) * (yy - y0) - (y1 - y0) * (xx - x0)) <= 0
        img = np.where(inside, 0.7 * val + 0.3 * img, img)
    return np.clip(img, 0, 255)


def dot_grid(rng, h, w):
    """Jittered dot lattices at random pitch/size (texture-detail proxy)."""
    img = 200.0 * rng.rand(h, w).astype(np.float32) * 0.15 + 30
    pitch = rng.randint(10, 30)
    r = rng.uniform(2, pitch * 0.35)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    oy, ox = rng.uniform(0, pitch, 2)
    dy = np.abs(((yy + oy) % pitch) - pitch / 2)
    dx = np.abs(((xx + ox) % pitch) - pitch / 2)
    dots = (dy * dy + dx * dx) < r * r
    return np.where(dots, rng.uniform(150, 255), img).astype(np.float32)


def warp_checker(rng, h, w):
    """Checkerboard under a smooth nonlinear warp (curved-surface proxy)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    a = rng.uniform(0.01, 0.05, 2)
    f = rng.uniform(0.02, 0.08, 2)
    u = xx + 25 * np.sin(f[0] * yy + rng.uniform(0, 6))
    v = yy + 25 * np.sin(f[1] * xx + rng.uniform(0, 6))
    sy, sx = rng.randint(10, 30), rng.randint(10, 30)
    img = 255.0 * ((np.floor(v / sy) + np.floor(u / sx)) % 2)
    return (0.8 * img + 35 * rng.rand(h, w)).astype(np.float32)


def main():
    rng = np.random.RandomState(42)
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    descs = []
    word_lists = []

    def extract(img):
        f = orb_ops.extract_orb(
            jnp.asarray(img, jnp.float32), n_features=600, cell=24
        )
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        return d

    # 1. scene views: orbit + strafe + scale changes
    n_views = 90
    for i in range(n_views):
        yaw = rng.uniform(-0.6, 0.6)
        pitch = rng.uniform(-0.25, 0.25)
        R = np.asarray(
            lie.so3_exp(jnp.array([pitch, yaw, rng.uniform(-0.2, 0.2)]))
        )
        t = np.array([
            rng.uniform(-1.0, 1.0), rng.uniform(-0.4, 0.4),
            rng.uniform(-1.5, 1.0),
        ])
        img, _ = synthetic.render(
            params, jnp.asarray(R), jnp.asarray(t), scene, h=H, w=W
        )
        d = extract(np.asarray(img))
        descs.append(d)
        print(f"view {i}: {len(d)} desc", flush=True)

    # 2. procedural textures — 6 families (held-out eval families in
    # tools/eval_vocab.py — gratings, blobs, Voronoi, grating products —
    # stay DISJOINT from this list)
    fams = [value_noise, checker, polygons, dot_grid, warp_checker]
    for i in range(150):
        img = fams[i % len(fams)](rng, H, W)
        # photometric augmentation: gain/bias jitter so the tree sees the
        # same structures under different exposures
        if i % 3 == 2:
            img = np.clip(
                rng.uniform(0.6, 1.4) * img + rng.uniform(-25, 25), 0, 255
            )
        d = extract(img)
        descs.append(d)
        print(f"tex {i}: {len(d)} desc", flush=True)

    all_desc = np.concatenate([d for d in descs if len(d)], axis=0)
    print("total descriptors:", all_desc.shape, flush=True)

    t0 = time.time()
    vocab = voc.train_vocabulary(
        all_desc, k=K_BRANCH, depth=DEPTH, iters=8, seed=0
    )
    print(f"trained in {time.time() - t0:.1f}s", flush=True)

    # idf over per-image documents
    for d in descs:
        if len(d) == 0:
            continue
        words = voc.transform(
            vocab, jnp.asarray(d), jnp.ones((len(d),), bool)
        )
        word_lists.append(np.asarray(words))
    vocab = voc.compute_idf(vocab, word_lists, len(word_lists))

    out = os.path.join(
        os.path.dirname(__file__), "..",
        "orb_slam3_detailed_comments_kor_tpu", "models", "default_vocab.npz",
    )
    np.savez_compressed(
        out,
        centroids=np.asarray(vocab.centroids).astype(np.uint8),
        k=K_BRANCH, depth=DEPTH, idf=np.asarray(vocab.idf),
    )
    print("wrote", out, os.path.getsize(out) // 1024, "KB")


if __name__ == "__main__":
    main()
