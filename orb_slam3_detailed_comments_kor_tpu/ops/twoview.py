"""Two-view reconstruction for monocular bootstrap.

Replaces ``TwoViewReconstruction`` (``src/TwoViewReconstruction.cc``:
parallel H/F RANSAC + model selection + motion recovery + DLT
triangulation) with a TPU-batched essential-matrix pipeline: intrinsics are
known, so we estimate E directly on normalized rays — a fixed budget of
8-point hypotheses evaluated as one batched [H,8,9] SVD, Sampson-error
inlier counting, closed-form decomposition into 4 motion candidates and a
cheirality vote.  (The reference's H-vs-F selection guards against planar
degeneracy; the E formulation with a spread sampling budget handles
moderate planarity, and full-planar bootstrap is deferred to an H-solver —
noted future work.)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam3_detailed_comments_kor_tpu.utils import lie


def _essential_from_8(ra: jnp.ndarray, rb: jnp.ndarray) -> jnp.ndarray:
    """8-point linear E: ra/rb [8,3] normalized rays (z=1). Returns [3,3]."""
    x1, y1 = ra[:, 0], ra[:, 1]
    x2, y2 = rb[:, 0], rb[:, 1]
    # rows of A: [x2x1, x2y1, x2, y2x1, y2y1, y2, x1, y1, 1] (E maps a→b)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
         jnp.ones_like(x1)], axis=-1
    )
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    # project to the essential manifold: singular values (1,1,0)
    U, _, Vt2 = jnp.linalg.svd(E)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ Vt2


def _sampson(E: jnp.ndarray, ra: jnp.ndarray, rb: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error per correspondence [M]."""
    Ex1 = ra @ E.T          # [M,3] = E @ ra
    Etx2 = rb @ E           # [M,3] = Eᵀ @ rb
    x2tEx1 = jnp.sum(rb * Ex1, axis=-1)
    denom = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return (x2tEx1 ** 2) / jnp.maximum(denom, 1e-12)


def triangulate_midpoint(R_ba, t_ba, rays_a, rays_b):
    """Midpoint triangulation in frame a. R_ba/t_ba: a→b transform.

    Returns (X_a [M,3], depth_a [M], depth_b [M]).
    """
    # rays in a-frame: da = rays_a ; direction of b-ray in a-frame:
    R_ab = R_ba.T
    db = rays_b @ R_ba  # R_ab @ rays_b
    oa = jnp.zeros(3)
    ob = -R_ba.T @ t_ba  # camera b center in a-frame
    # solve [da, -db] [s; u] = ob - oa  in least squares (2 unknowns)
    w = ob - oa
    aa = jnp.sum(rays_a * rays_a, -1)
    bb = jnp.sum(db * db, -1)
    ab = jnp.sum(rays_a * db, -1)
    aw = rays_a @ w
    bw = db @ w
    # closest points on the two rays: s·aa − u·ab = aw ; s·ab − u·bb = bw
    den = aa * bb - ab * ab
    s = (aw * bb - bw * ab) / jnp.maximum(den, 1e-12)
    u = (aw * ab - bw * aa) / jnp.maximum(den, 1e-12)
    Pa = rays_a * s[:, None]
    Pb = ob + db * u[:, None]
    X = 0.5 * (Pa + Pb)
    depth_a = X[:, 2]
    Xb = X @ R_ba.T + t_ba
    return X, depth_a, Xb[:, 2]


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray        # scalar bool
    R_ba: jnp.ndarray      # [3,3] rotation a→b
    t_ba: jnp.ndarray      # [3] unit-norm translation a→b
    X: jnp.ndarray         # [M,3] triangulated points in a-frame
    inlier: jnp.ndarray    # [M] bool (E-inlier & cheirality & parallax)
    n_good: jnp.ndarray


def reconstruct_two_views(
    rays_a: jnp.ndarray,
    rays_b: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 256,
    inlier_th: float = 3e-6,
    min_parallax_cos: float = 0.9998,
) -> TwoViewResult:
    """Full mono bootstrap: E-RANSAC + decompose + cheirality + triangulate.

    rays_a/b [M,3] unit-depth rays of matched features; inlier_th is the
    Sampson threshold on normalized coords (~(1.5px/f)²).
    """
    M = rays_a.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1e-9)
    idx = jax.random.choice(key, M, shape=(n_hyp, 8), p=probs)

    def one(sample):
        E = _essential_from_8(rays_a[sample], rays_b[sample])
        err = _sampson(E, rays_a, rays_b)
        inl = (err < inlier_th) & valid
        return E, inl, jnp.sum(inl)

    Es, inls, counts = jax.vmap(one)(idx)
    best = jnp.argmax(counts)
    E = Es[best]
    inl_e = inls[best]

    # decompose: E = U diag(1,1,0) Vt; R ∈ {U W Vt, U Wᵀ Vt}, t = ±U[:,2]
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    U = U * jnp.where(d < 0, -1.0, 1.0)  # enforce det(R)=+1
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t_u = U[:, 2]
    cands = [(R1, t_u), (R1, -t_u), (R2, t_u), (R2, -t_u)]

    def score(Rc, tc):
        X, da, db_ = triangulate_midpoint(Rc, tc, rays_a, rays_b)
        ok = inl_e & (da > 0.0) & (db_ > 0.0)
        return jnp.sum(ok), X, ok

    scores = []
    for Rc, tc in cands:
        scores.append(score(Rc, tc))
    counts4 = jnp.stack([s[0] for s in scores])
    best4 = jnp.argmax(counts4)
    Xs = jnp.stack([s[1] for s in scores])
    oks = jnp.stack([s[2] for s in scores])
    R_ba = jnp.stack([c[0] for c in cands])[best4]
    t_ba = jnp.stack([c[1] for c in cands])[best4]
    X = Xs[best4]
    good = oks[best4]

    # parallax gate: angle between the two rays at the triangulated point
    ob = -R_ba.T @ t_ba
    v1 = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-9)
    v2 = X - ob
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-9)
    cospar = jnp.sum(v1 * v2, axis=-1)
    good = good & (cospar < min_parallax_cos)

    n_good = jnp.sum(good)
    ok = (n_good >= 50) & (n_good >= 0.5 * jnp.maximum(counts[best], 1))
    return TwoViewResult(
        ok=ok, R_ba=R_ba, t_ba=t_ba, X=X, inlier=good, n_good=n_good
    )


# ---------------------------------------------------------------------------
# Homography pipeline (planar scenes) — the reference computes H and F in
# parallel threads and selects by score ratio (TwoViewReconstruction.h:44-70,
# Initializer::ReconstructH); here both models are batched RANSACs in the
# same program and the selection is the same inlier-score ratio.
# ---------------------------------------------------------------------------

def _homography_from_4(ra: jnp.ndarray, rb: jnp.ndarray) -> jnp.ndarray:
    """DLT homography from 4 ray pairs (normalized coords x/z, y/z).

    ra/rb [4,3] unit-depth rays; returns H [3,3] with rb ~ H ra.
    """
    xa, ya = ra[:, 0] / ra[:, 2], ra[:, 1] / ra[:, 2]
    xb, yb = rb[:, 0] / rb[:, 2], rb[:, 1] / rb[:, 2]
    zero = jnp.zeros_like(xa)
    one = jnp.ones_like(xa)
    # two equations per correspondence
    r1 = jnp.stack([xa, ya, one, zero, zero, zero,
                    -xb * xa, -xb * ya, -xb], axis=-1)
    r2 = jnp.stack([zero, zero, zero, xa, ya, one,
                    -yb * xa, -yb * ya, -yb], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # [8,9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1].reshape(3, 3)


def _h_transfer_err2(H: jnp.ndarray, ra: jnp.ndarray, rb: jnp.ndarray):
    """Symmetric transfer error² in normalized coords."""
    pa = ra / ra[:, 2:3]
    pb = rb / rb[:, 2:3]
    q = pa @ H.T
    q = q / jnp.where(jnp.abs(q[:, 2:3]) < 1e-12, 1e-12, q[:, 2:3])
    e_fwd = jnp.sum((q[:, :2] - pb[:, :2]) ** 2, axis=-1)
    Hi = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    qi = pb @ Hi.T
    qi = qi / jnp.where(jnp.abs(qi[:, 2:3]) < 1e-12, 1e-12, qi[:, 2:3])
    e_bwd = jnp.sum((qi[:, :2] - pa[:, :2]) ** 2, axis=-1)
    return e_fwd + e_bwd


def _decompose_homography(H: jnp.ndarray):
    """Faugeras SVD decomposition of a calibrated homography into the 8
    (R, t) motion hypotheses (Initializer::ReconstructH algorithm;
    ``src/TwoViewReconstruction.cc`` / Faugeras & Lustman 1988).

    Returns (R [8,3,3], t [8,3]) with ‖t‖=1 (t is up-to-scale).
    """
    U, dvals, Vt = jnp.linalg.svd(H)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = dvals[0], dvals[1], dvals[2]

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0, None))
    x3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0, None))
    d2s = jnp.maximum(d2, 1e-12)

    Rs, ts = [], []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            # case d' = +d2
            st = (d1 - d3) * (e1 * x1) * (e3 * x3) / d2s
            ct = (d1 * x3 * x3 + d3 * x1 * x1) / d2s
            Rp = jnp.array([[1.0, 0.0, 0.0],
                            [0.0, 1.0, 0.0],
                            [0.0, 0.0, 1.0]])
            Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st)
            Rp = Rp.at[2, 0].set(st).at[2, 2].set(ct)
            tp = jnp.array([e1 * x1, 0.0, -e3 * x3]) * (d1 - d3)
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            # case d' = −d2 (reflection branch)
            sphi = (d1 + d3) * (e1 * x1) * (e3 * x3) / d2s
            cphi = (d3 * x1 * x1 - d1 * x3 * x3) / d2s
            Rp = jnp.zeros((3, 3))
            Rp = Rp.at[0, 0].set(cphi).at[0, 2].set(sphi)
            Rp = Rp.at[1, 1].set(-1.0)
            Rp = Rp.at[2, 0].set(sphi).at[2, 2].set(-cphi)
            tp = jnp.array([e1 * x1, 0.0, e3 * x3]) * (d1 + d3)
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)
    R8 = jnp.stack(Rs)
    t8 = jnp.stack(ts)
    t8 = t8 / jnp.maximum(jnp.linalg.norm(t8, axis=-1, keepdims=True), 1e-12)
    return R8, t8


def reconstruct_two_views_hf(
    rays_a: jnp.ndarray,
    rays_b: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 256,
    inlier_th: float = 3e-6,
    min_parallax_cos: float = 0.9998,
) -> TwoViewResult:
    """Mono bootstrap with parallel E/H model selection.

    Runs the essential-matrix RANSAC and a homography RANSAC on the same
    correspondences; if the homography explains clearly more inliers
    (planar / low-parallax scene — the regime where E is degenerate), the
    motion is recovered from the Faugeras decomposition instead
    (reference: R_H = S_H/(S_H+S_F) > 0.4 picks H,
    ``TwoViewReconstruction``)."""
    import jax as _jax

    M = rays_a.shape[0]
    k_e, k_h = _jax.random.split(key)
    res_e = reconstruct_two_views(
        rays_a, rays_b, valid, k_e, n_hyp=n_hyp, inlier_th=inlier_th,
        min_parallax_cos=min_parallax_cos,
    )

    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1e-9)
    idx = _jax.random.choice(k_h, M, shape=(n_hyp, 4), p=probs)

    def one(sample):
        H = _homography_from_4(rays_a[sample], rays_b[sample])
        err = _h_transfer_err2(H, rays_a, rays_b)
        inl = (err < 4.0 * inlier_th) & valid
        return H, inl, jnp.sum(inl)

    Hs, inls_h, counts_h = _jax.vmap(one)(idx)
    best_h = jnp.argmax(counts_h)
    H = Hs[best_h]
    inl_h = inls_h[best_h]
    n_h = counts_h[best_h].astype(jnp.float32)
    n_e = res_e.n_good.astype(jnp.float32)

    # Faugeras hypotheses, scored by cheirality over H-inliers
    R8, t8 = _decompose_homography(H)

    def score(Rc, tc):
        X, da, db_ = triangulate_midpoint(Rc, tc, rays_a, rays_b)
        ok = inl_h & (da > 0.0) & (db_ > 0.0)
        ob = -Rc.T @ tc
        v1 = X / jnp.maximum(
            jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-9
        )
        v2 = X - ob
        v2 = v2 / jnp.maximum(
            jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-9
        )
        ok = ok & (jnp.sum(v1 * v2, axis=-1) < min_parallax_cos)
        return jnp.sum(ok), X, ok

    counts8, X8, ok8 = _jax.vmap(score)(R8, t8)
    b8 = jnp.argmax(counts8)
    second = jnp.sort(counts8)[-2]
    n_good_h = counts8[b8]
    # reference demands a clear cheirality winner before accepting H
    h_ok = (n_good_h >= 50) & (second.astype(jnp.float32)
                               < 0.75 * n_good_h.astype(jnp.float32))

    ratio_h = n_h / jnp.maximum(n_h + n_e, 1.0)
    use_h = (ratio_h > 0.45) & h_ok
    return TwoViewResult(
        ok=jnp.where(use_h, True, res_e.ok),
        R_ba=jnp.where(use_h, R8[b8], res_e.R_ba),
        t_ba=jnp.where(use_h, t8[b8], res_e.t_ba),
        X=jnp.where(use_h, X8[b8], res_e.X),
        inlier=jnp.where(use_h, ok8[b8], res_e.inlier),
        n_good=jnp.where(use_h, n_good_h, res_e.n_good),
    )
