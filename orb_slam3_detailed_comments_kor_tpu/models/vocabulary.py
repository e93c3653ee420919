"""Binary-descriptor vocabulary tree: DBoW2 replacement, array-native.

Replaces ``Thirdparty/DBoW2`` (``TemplatedVocabulary.h:135-162`` transform/
score, ``FORB`` descriptor ops): a hierarchical k-medians tree over 256-bit
ORB descriptors, stored as dense per-level centroid arrays so that
``transform`` is a cascade of batched Hamming argmins — each level is one
popcount-matmul on the MXU (see ``ops/matching.hamming_matrix``).

The reference ships a ~1M-word vocabulary trained on Flickr images
(stripped from this repo — SURVEY.md caveats); we *train* a compact
vocabulary from descriptors of the target domain instead (k^L words, k=10,
L=3-4).  BoW vectors are dense tf-idf [W] arrays; keyframe database scoring
(``KeyFrameDatabase.cc``) is then a single [Q,W]x[W,K] matmul — the
inverted file *is* the matmul.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    """k-ary tree of depth L over 256-bit descriptors (bit-unpacked)."""

    centroids: jnp.ndarray  # [n_nodes, 256] float32 in {0,1}; level-major
    k: int                  # branching factor
    depth: int              # levels below root
    idf: jnp.ndarray        # [k^depth] inverse document frequency weights

    @property
    def n_words(self) -> int:
        return self.k ** self.depth


def _kmedians_binary(desc: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """k-medians over binary descriptors (majority vote medians)."""
    n = desc.shape[0]
    if n <= k:
        cent = np.zeros((k, desc.shape[1]), np.float32)
        cent[:n] = desc
        return cent
    idx = rng.choice(n, k, replace=False)
    cent = desc[idx].astype(np.float32)
    for _ in range(iters):
        d = (
            desc.sum(1)[:, None] + cent.sum(1)[None, :]
            - 2.0 * desc.astype(np.float32) @ cent.T
        )
        assign = d.argmin(1)
        for c in range(k):
            m = assign == c
            if m.sum() > 0:
                cent[c] = (desc[m].mean(0) > 0.5).astype(np.float32)
            else:
                cent[c] = desc[rng.randint(n)]
    return cent


def train_vocabulary(
    descriptors: np.ndarray, k: int = 10, depth: int = 3, iters: int = 8,
    seed: int = 0,
) -> Vocabulary:
    """Hierarchical k-medians training (host-side, one-time).

    descriptors: [N,256] uint8 bits. Returns a Vocabulary with uniform idf
    (refined later by `compute_idf` over a corpus).
    """
    rng = np.random.RandomState(seed)
    desc = descriptors.astype(np.float32)
    levels = []
    # level 0: k centroids over all
    assignments = np.zeros((desc.shape[0],), np.int64)
    n_clusters = 1
    for lvl in range(depth):
        cents = np.zeros((n_clusters * k, 256), np.float32)
        new_assign = np.zeros_like(assignments)
        for c in range(n_clusters):
            m = assignments == c
            sub = desc[m]
            cent = _kmedians_binary(sub, k, iters, rng)
            cents[c * k:(c + 1) * k] = cent
            if m.sum() > 0:
                d = (
                    sub.sum(1)[:, None] + cent.sum(1)[None, :]
                    - 2.0 * sub @ cent.T
                )
                new_assign[m] = c * k + d.argmin(1)
        levels.append(cents)
        assignments = new_assign
        n_clusters *= k
    centroids = np.concatenate(levels, axis=0)
    n_words = k ** depth
    return Vocabulary(
        centroids=jnp.asarray(centroids),
        k=k,
        depth=depth,
        idf=jnp.ones((n_words,)),
    )


_DEFAULT_VOCAB_CACHE: "Vocabulary" = None


def load_default() -> "Vocabulary":
    """Load the pretrained default vocabulary asset (the analog of the
    reference's ORBvoc.txt load at startup, ``System.cc:82``).

    Cached per process: the unpacked centroid array is ~114 MB on device,
    and re-uploading it for every SlamSystem construction (bench builds
    six, the Atlas builds one per map reset) stalled each new system's
    first frame for >1 s behind the host→device transfer. The vocabulary
    is immutable, so every consumer shares one device copy.
    """
    global _DEFAULT_VOCAB_CACHE
    if _DEFAULT_VOCAB_CACHE is not None:
        return _DEFAULT_VOCAB_CACHE
    import os

    path = os.path.join(os.path.dirname(__file__), "default_vocab.npz")
    z = np.load(path)
    _DEFAULT_VOCAB_CACHE = Vocabulary(
        centroids=jnp.asarray(z["centroids"].astype(np.float32)),
        k=int(z["k"]),
        depth=int(z["depth"]),
        idf=jnp.asarray(z["idf"].astype(np.float32)),
    )
    return _DEFAULT_VOCAB_CACHE


def _level_offset(k: int, lvl: int) -> int:
    """Start index of level `lvl` (0-based) in the flat centroid array."""
    return sum(k ** (l + 1) for l in range(lvl))


def transform(
    vocab: Vocabulary, desc_bits: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Descriptors → word ids. [N,256] {0,1} → [N] int32 (-1 invalid).

    Cascaded Hamming argmin: at each level only the k children of the
    current node are compared — implemented as a gather of child centroids
    + batched distance argmin (TemplatedVocabulary::transform analog).
    """
    n = desc_bits.shape[0]
    d = desc_bits.astype(jnp.float32)
    node = jnp.zeros((n,), jnp.int32)  # index within level (cluster id)
    for lvl in range(vocab.depth):
        off = _level_offset(vocab.k, lvl)
        child_ids = node[:, None] * vocab.k + jnp.arange(vocab.k)[None, :]
        cents = vocab.centroids[off + child_ids]  # [N,k,256]
        dist = (
            jnp.sum(d, axis=1, keepdims=True)
            + jnp.sum(cents, axis=2)
            - 2.0 * jnp.einsum(
                "nd,nkd->nk", d, cents,
                precision=jax.lax.Precision.DEFAULT,
            )
        )
        node = (node * vocab.k + jnp.argmin(dist, axis=1)).astype(jnp.int32)
    return jnp.where(valid, node, -1)


def transform_exact(
    vocab: Vocabulary, desc_bits: jnp.ndarray, valid: jnp.ndarray,
    chunk: int = 32768,
) -> jnp.ndarray:
    """Descriptors → word ids by EXACT nearest leaf centroid.

    The hierarchical descent (:func:`transform`) is an approximate nearest
    -word search — it exists so CPUs can avoid the [N, W] distance matrix.
    On the MXU that matrix IS one popcount-identity matmul
    ([1200,256]×[256,100k] ≈ 61 GFLOP ≈ 1-2 ms), so exact assignment is
    affordable at keyframe rate and removes tree-descent quantization
    error: a perturbed descriptor that would flip to a sibling branch at
    some internal level still lands in its true nearest word. (DBoW2 pays
    the descent approximation, ``TemplatedVocabulary.h:135-162``.)
    Chunked over words to bound the distance-matrix working set.
    """
    n = desc_bits.shape[0]
    d = desc_bits.astype(jnp.float32)
    d_sum = jnp.sum(d, axis=1, keepdims=True)
    off = _level_offset(vocab.k, vocab.depth - 1)
    W = vocab.n_words
    best_d = jnp.full((n,), jnp.inf)
    best_i = jnp.zeros((n,), jnp.int32)
    for c0 in range(0, W, chunk):
        cents = jax.lax.dynamic_slice_in_dim(
            vocab.centroids, off + c0, min(chunk, W - c0), axis=0
        )
        dist = (
            d_sum + jnp.sum(cents, axis=1)[None, :]
            - 2.0 * d @ cents.T
        )
        a = jnp.argmin(dist, axis=1)
        dm = jnp.take_along_axis(dist, a[:, None], axis=1)[:, 0]
        upd = dm < best_d
        best_d = jnp.where(upd, dm, best_d)
        best_i = jnp.where(upd, (c0 + a).astype(jnp.int32), best_i)
    return jnp.where(valid, best_i, -1)


def transform_exact_topk(
    vocab: Vocabulary, desc_bits: jnp.ndarray, valid: jnp.ndarray,
    kk: int = 2, chunk: int = 32768,
):
    """Exact top-``kk`` nearest leaf words + Hamming distances.

    Soft-assignment front half: a noisy descriptor near a word boundary
    contributes to BOTH words instead of flipping between them across
    observations (the flip is what kills BoW recall on low-gradient
    texture — rBRIEF bits there sit at the comparison threshold).
    Returns (ids [N,kk] int32, dist [N,kk] f32); invalid rows get id -1.
    """
    n = desc_bits.shape[0]
    d = desc_bits.astype(jnp.float32)
    d_sum = jnp.sum(d, axis=1, keepdims=True)
    off = _level_offset(vocab.k, vocab.depth - 1)
    W = vocab.n_words
    best_d = jnp.full((n, kk), jnp.inf)
    best_i = jnp.zeros((n, kk), jnp.int32)
    rows = jnp.arange(n)
    for c0 in range(0, W, chunk):
        cents = jax.lax.dynamic_slice_in_dim(
            vocab.centroids, off + c0, min(chunk, W - c0), axis=0
        )
        dist = (
            d_sum + jnp.sum(cents, axis=1)[None, :]
            - 2.0 * d @ cents.T
        )
        # iterative k-argmin instead of lax.top_k: top_k is sort-based and
        # dominated the whole keyframe insertion on TPU (~hundreds of ms
        # per [N,chunk] call); kk reduction passes are a few fused reduces
        nd_cols = []
        for _ in range(kk):
            a = jnp.argmin(dist, axis=1)
            dm = jnp.take_along_axis(dist, a[:, None], axis=1)[:, 0]
            nd_cols.append((dm, a))
            dist = dist.at[rows, a].set(jnp.inf)
        nd = jnp.stack([c[0] for c in nd_cols], axis=1)
        na = jnp.stack([c[1] for c in nd_cols], axis=1)
        cat_d = jnp.concatenate([best_d, nd], axis=1)
        cat_i = jnp.concatenate(
            [best_i, (c0 + na).astype(jnp.int32)], axis=1
        )
        # [2*kk]-wide merge: same iterative selection (tiny)
        sel_cols = []
        for _ in range(kk):
            a = jnp.argmin(cat_d, axis=1)
            dm = jnp.take_along_axis(cat_d, a[:, None], axis=1)[:, 0]
            ii = jnp.take_along_axis(cat_i, a[:, None], axis=1)[:, 0]
            sel_cols.append((dm, ii))
            cat_d = cat_d.at[rows, a].set(jnp.inf)
        best_d = jnp.stack([c[0] for c in sel_cols], axis=1)
        best_i = jnp.stack([c[1] for c in sel_cols], axis=1)
    best_i = jnp.where(valid[:, None], best_i, -1)
    return best_i, best_d


def soft_assign_weights(dist: jnp.ndarray, sigma: float = 16.0):
    """Distance → per-word weights, L1-normalized per descriptor
    (exp(-d/σ) kernel; σ in Hamming bits)."""
    w = jnp.exp(-(dist - dist[:, :1]) / sigma)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)


def bow_vector_soft(
    vocab: Vocabulary, ids: jnp.ndarray, wts: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Soft word assignments → L1-normalized tf-idf dense vector."""
    W = vocab.n_words
    contrib = wts * valid[:, None].astype(jnp.float32)
    counts = jnp.zeros((W,)).at[jnp.clip(ids, 0)].add(
        jnp.where(ids >= 0, contrib, 0.0), mode="drop"
    )
    v = counts * vocab.idf
    return v / jnp.maximum(jnp.sum(v), 1e-9)


def bow_vector(
    vocab: Vocabulary, words: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Word ids → L1-normalized tf-idf dense vector [n_words]
    (BowVector analog)."""
    W = vocab.n_words
    counts = jnp.zeros((W,)).at[jnp.clip(words, 0)].add(
        valid.astype(jnp.float32), mode="drop"
    )
    v = counts * vocab.idf
    s = jnp.sum(v)
    return v / jnp.maximum(s, 1e-9)


def l1_score(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity: s = 1 − ½·Σ|a−b| ∈ [0,1] (ScoringObject L1)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a - b), axis=-1)


#: per-document sparse BoW truncation. With soft top-3 assignment a
#: 1,200-feature frame touches up to ~3,600 words, but the tail weights are
#: tiny — 2,048 slots keep >99% of the L1 mass (measured in the r5 scheme
#: sweep); the database row is 16 KB instead of 400 KB dense
TOPW = 2048

#: production BoW assignment scheme (selected by the held-out 512-place
#: sweep, VOCAB_EVAL.md): exact top-SOFT_K nearest leaf words, exp(-d/σ)
#: soft weights, idf² term weighting. vs the r4 tree-descent hard
#: assignment at matched FP this lifted warped recall@3 0.77→0.88 and the
#: worst (low-gradient) family 0.375→0.72.
SOFT_K = 3
SOFT_SIGMA = 8.0
IDF_POW = 2.0


def sparse_bow_soft_from_desc(
    vocab: Vocabulary, desc_bits: jnp.ndarray, valid: jnp.ndarray,
    topw: int = TOPW,
):
    """Descriptors → production sparse BoW row in one call: exact top-K
    soft assignment (SOFT_K/SOFT_SIGMA) + idf^IDF_POW weighting +
    L1-normalization + top-``topw`` truncation. The single entry point
    used by keyframe insertion, loop detection queries and relocalization
    so database rows and queries always share the scheme."""
    ids, dist = transform_exact_topk(vocab, desc_bits, valid, kk=SOFT_K)
    w = soft_assign_weights(dist, sigma=SOFT_SIGMA)
    W = vocab.n_words
    contrib = w * valid[:, None].astype(jnp.float32)
    counts = jnp.zeros((W,)).at[jnp.clip(ids, 0)].add(
        jnp.where(ids >= 0, contrib, 0.0), mode="drop"
    )
    v = counts * vocab.idf ** IDF_POW
    v = v / jnp.maximum(jnp.sum(v), 1e-9)
    # approx_max_k: TPU-native partial selection (top_k's full sort over
    # the 100k-word axis cost ~100 ms; the approximate variant keeps
    # >99% of the retained mass at a fraction of the time)
    wts, out_ids = jax.lax.approx_max_k(v, topw)
    out_ids = jnp.where(wts > 0, out_ids, -1)
    return out_ids.astype(jnp.int32), wts


def sparse_bow(
    vocab: Vocabulary, words: jnp.ndarray, valid: jnp.ndarray,
    topw: int = TOPW,
):
    """Word ids → sparse BoW: (ids [topw] int32, weights [topw] f32).

    The reference keeps an inverted file of word→keyframe lists
    (``KeyFrameDatabase.h:80``); the TPU-resident analog keeps each
    document's word list instead — same memory class (O(features) per
    keyframe, not O(vocabulary)), but scoring stays a batched device
    reduction (:func:`sparse_l1_score`). Weights are the L1-normalized
    tf-idf entries (normalized BEFORE truncation, so scores remain
    comparable with dense vectors); ids are -1 past the document's
    distinct-word count.
    """
    W = vocab.n_words
    counts = jnp.zeros((W,)).at[jnp.clip(words, 0)].add(
        valid.astype(jnp.float32), mode="drop"
    )
    v = counts * vocab.idf
    v = v / jnp.maximum(jnp.sum(v), 1e-9)
    wts, ids = jax.lax.top_k(v, topw)
    ids = jnp.where(wts > 0, ids, -1)
    return ids.astype(jnp.int32), wts


def sparse_l1_score(q_ids, q_wts, db_ids, db_wts):
    """L1 similarity between a sparse query and sparse database rows.

    For L1-normalized documents, 1 − ½Σ_w|a_w − b_w| = Σ_{w∈a∩b}
    min(a_w, b_w) — the same identity DBoW2's L1 scoring exploits
    (``ScoringObject.cpp``), so this returns EXACTLY :func:`l1_score` of
    the corresponding dense vectors whenever neither document was
    truncated. q_ids/q_wts [T]; db_ids/db_wts [..., T] → [...] scores.
    """
    eq = (
        (db_ids[..., :, None] == q_ids[None, :])
        & (q_ids >= 0)[None, :]
        & (db_ids >= 0)[..., :, None]
    )
    m = jnp.minimum(db_wts[..., :, None], q_wts[None, :])
    return jnp.sum(jnp.where(eq, m, 0.0), axis=(-2, -1))


def score_against_database(query_bow: jnp.ndarray, db_bows: jnp.ndarray):
    """Score one query against all database rows: [W] vs [K,W] → [K].

    L1 similarity expanded to matmul-friendly form is still |a−b| based, so
    we compute it directly (the [K,W] subtraction is one fused VPU pass).
    """
    return l1_score(query_bow[None, :], db_bows)


def compute_idf(vocab: Vocabulary, word_lists, n_docs: int) -> Vocabulary:
    """Refresh idf from a corpus: idf_w = log(n_docs / (1 + df_w))."""
    df = np.zeros((vocab.n_words,), np.float32)
    for words in word_lists:
        ws = np.unique(np.asarray(words))
        ws = ws[ws >= 0]
        df[ws] += 1
    idf = np.log(max(n_docs, 1) / (1.0 + df)) + 1.0
    return vocab._replace(idf=jnp.asarray(np.maximum(idf, 1e-3)))
