"""Keyframe retrieval: view similarity + FPS + greedy ordering.

The reference builds its N×N view-similarity matrix with a trained
retrieval head + ASMK (/root/reference/src/panst3r/engine/
retrieval.py:12-48, panst3r.py:88-125): must3r `RetrievalModel` (frozen
encoder backbone → prewhiten → projector MLP → postwhiten, per-token
`featweights`) feeding an ASMK inverted-file index (Cython + FAISS).
Two TPU-native paths here:

- ``view_similarity`` — untrained pooled-cosine proxy (no checkpoint
  needed; the default).
- ``RetrievalHead`` + ``asmk_similarity`` — the trained path: the
  whitening/projector stack and the top-1 codebook assignment are dense
  MXU matmuls; the per-word binarized-residual aggregation and sparse
  word-intersection scoring run on host (numpy), exactly where the
  reference runs its ASMK CPU kernels.  ``port_retrieval_checkpoint``
  (tools/port_torch_checkpoint.py) maps the released retrieval ``.pth``
  (ckpt['model'] + ckpt['asmk_codebook']) into ``RetrievalHead.params``.

The FPS + greedy ordering logic reproduces the reference exactly.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def view_similarity(tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens: (N_views, N_tokens, C) encoder features → (N, N) cosine
    similarity of generalized-mean-pooled descriptors."""
    desc = jnp.sign(tokens) * jnp.sqrt(jnp.abs(tokens))  # signed sqrt (VLAD-ish)
    desc = desc.mean(axis=1)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True),
                              1e-8)
    return desc @ desc.T


def farthest_point_sampling(dist: np.ndarray, n: int, start: int = 0,
                            dist_thresh: float | None = None) -> list[int]:
    """Greedy FPS on a distance matrix (must3r farthest_point_sampling
    surface incl. ``dist_thresh``; reference call panst3r.py:104 passes
    None).  With a threshold, sampling stops once every remaining view is
    within ``dist_thresh`` of a selected one — fewer keyframes on
    redundant sequences."""
    N = dist.shape[0]
    n = min(n, N)
    selected = [start]
    min_d = dist[start].astype(np.float64).copy()
    # Selected views are excluded outright (-1): when every view is
    # equidistant (degenerate similarity), argmax over the all-zero min_d
    # would re-pick index 0 and return duplicate keyframes.
    min_d[start] = -1.0
    for _ in range(n - 1):
        nxt = int(np.argmax(min_d))
        if dist_thresh is not None and min_d[nxt] < dist_thresh:
            break
        selected.append(nxt)
        min_d = np.minimum(min_d, dist[nxt])
        min_d[nxt] = -1.0
    return selected


def select_keyframes_retrieval(tokens, num_keyframes: int,
                               head: Optional["RetrievalHead"] = None
                               ) -> list[int]:
    """Keyframe selection by retrieval (reference panst3r.py:88-125):
    FPS over (1 − sim) for coverage, then greedy max-overlap ordering so the
    memory is built connected-first.  With a ported ``RetrievalHead``
    (+codebook), similarity comes from the trained ASMK path; otherwise
    from the pooled-cosine proxy."""
    if head is not None and head.codebook is not None:
        sim = asmk_similarity(head, tokens)
    else:
        sim = np.asarray(view_similarity(tokens))
    anchor_idx = farthest_point_sampling(1.0 - sim, num_keyframes)
    sub = sim[np.ix_(anchor_idx, anchor_idx)].astype(np.float64)
    np.fill_diagonal(sub, 0.0)

    sim_sum = sub.sum(-1)
    order = [int(np.argmax(sim_sum))]     # highest total overlap first (:111)
    # Selected columns are masked with -inf, not 0: when similarities are
    # non-positive (degenerate descriptors) a zeroed column would win the
    # argmax again and the order would contain duplicates.
    sub[:, order[0]] = -np.inf
    while len(order) < len(anchor_idx):
        rows = sub[np.asarray(order)]
        nxt = int(np.unravel_index(np.argmax(rows), rows.shape)[1])  # :117-119
        order.append(nxt)
        sub[:, nxt] = -np.inf
    return [anchor_idx[k] for k in order]


def select_keyframes_retrieval_device(tokens: jnp.ndarray,
                                      num_keyframes: int) -> jnp.ndarray:
    """Traced (jit-safe) variant of ``select_keyframes_retrieval`` for the
    one-program serve wire: pooled-cosine similarity + FPS + greedy
    max-overlap ordering entirely on device; returns (K,) int32 indices.
    Matches the host path exactly on non-degenerate descriptors (same
    argmax-first tie-breaking; f32 vs the host's f64 only matters on exact
    ties).  The trained ASMK head stays on the staged path (its inverted
    file is host-side)."""
    import jax

    sim = view_similarity(tokens.astype(jnp.float32))        # (V, V)
    K = num_keyframes
    dist = 1.0 - sim

    def fps_body(i, st):
        sel, min_d = st
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        sel = sel.at[i].set(nxt)
        min_d = jnp.minimum(min_d, dist[nxt]).at[nxt].set(-1.0)
        return sel, min_d

    sel0 = jnp.zeros((K,), jnp.int32)                        # start = 0
    min_d0 = dist[0].at[0].set(-1.0)
    anchors, _ = jax.lax.fori_loop(1, K, fps_body, (sel0, min_d0))

    sub = sim[anchors][:, anchors] * (1.0 - jnp.eye(K, dtype=sim.dtype))
    first = jnp.argmax(sub.sum(-1)).astype(jnp.int32)

    def greedy_body(i, st):
        order, rowmax, chosen = st
        nxt = jnp.argmax(jnp.where(chosen, -jnp.inf, rowmax)).astype(
            jnp.int32)
        order = order.at[i].set(nxt)
        chosen = chosen.at[nxt].set(True)
        rowmax = jnp.maximum(rowmax, sub[nxt])
        return order, rowmax, chosen

    order0 = jnp.zeros((K,), jnp.int32).at[0].set(first)
    chosen0 = jnp.zeros((K,), bool).at[first].set(True)
    order, _, _ = jax.lax.fori_loop(
        1, K, greedy_body, (order0, sub[first], chosen0))
    return anchors[order]


@dataclasses.dataclass
class RetrievalHead:
    """Trained retrieval projection (must3r RetrievalModel minus backbone).

    Stages (each optional, matching the reference checkpoint's ``args``):
    prewhiten (affine whitener, stored as flax-layout (kernel, bias):
    x ← x @ W + b — exactly a ported torch Linear), projector MLP over
    ``hdims`` with GELU between layers (optionally residual), postwhiten,
    then L2 normalization; per-token weights are the pre-projection L2
    norms (``featweights='l2norm'``).
    """

    prewhiten: Optional[tuple] = None        # (W (D, Dw), b (Dw,))
    projector: Sequence[tuple] = ()          # [(W (Di, Do), b (Do,)), ...]
    residual: bool = False
    postwhiten: Optional[tuple] = None
    codebook: Optional[np.ndarray] = None    # (K, D) ASMK centroids
    alpha: float = 3.0                       # ASMK selective-match exponent
    similarity_threshold: float = 0.0

    def project(self, tokens: jnp.ndarray):
        """tokens (..., N, D) → (projected (..., N, D'), weights (..., N))."""
        x = tokens.astype(jnp.float32)
        w = jnp.linalg.norm(x, axis=-1)                    # featweights
        if self.prewhiten is not None:
            W, b = self.prewhiten
            x = x @ jnp.asarray(W) + jnp.asarray(b)
        if self.projector:
            h = x
            for i, (W, b) in enumerate(self.projector):
                h = h @ jnp.asarray(W) + jnp.asarray(b)
                if i + 1 < len(self.projector):
                    h = jax.nn.gelu(h, approximate=False)
            x = x + h if (self.residual and h.shape == x.shape) else h
        if self.postwhiten is not None:
            W, b = self.postwhiten
            x = x @ jnp.asarray(W) + jnp.asarray(b)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        return x, w

    def assign_and_binarize(self, tokens: jnp.ndarray):
        """Top-1 codebook assignment + binarized residuals (ASMK★).

        tokens (V, N, D) → (words (V, N) int32, bits (V, N, D) ±1 int8,
        weights (V, N)).  The (V·N, K) assignment is one MXU matmul.
        """
        assert self.codebook is not None, "no ASMK codebook loaded"
        x, w = self.project(tokens)
        C = jnp.asarray(self.codebook, jnp.float32)        # (K, D)
        Cn = C / jnp.maximum(jnp.linalg.norm(C, axis=-1, keepdims=True),
                             1e-8)
        # nearest centroid in L2 == max (x·c − ||c||²/2); x is unit-norm.
        score = x @ C.T - 0.5 * jnp.sum(C * C, axis=-1)
        words = jnp.argmax(score, axis=-1).astype(jnp.int32)
        resid = x - Cn[words]
        bits = jnp.where(resid >= 0, 1, -1).astype(jnp.int8)
        return words, bits, w


def asmk_similarity(head: RetrievalHead, tokens: jnp.ndarray) -> np.ndarray:
    """(V, N, D) encoder tokens → (V, V) ASMK★ similarity matrix.

    Device: projection + assignment + binarization (matmuls).  Host: per
    (view, word) aggregation (sum of bits → sign) and the sparse
    word-intersection scoring σ_α(u) = sign(u)·|u|^α over normalized
    binary dot products — the part the reference also runs on CPU.
    """
    words, bits, _ = head.assign_and_binarize(tokens)
    words = np.asarray(words)
    bits = np.asarray(bits, np.float32)
    V, N, D = bits.shape

    agg_words, agg_bits, norms = [], [], []
    for v in range(V):
        order = np.argsort(words[v], kind="stable")
        w_sorted = words[v][order]
        uniq, starts = np.unique(w_sorted, return_index=True)
        sums = np.add.reduceat(bits[v][order], starts, axis=0)
        b = np.where(sums >= 0, 1.0, -1.0)                 # re-binarize
        agg_words.append(uniq)
        agg_bits.append(b)
        norms.append(np.sqrt(len(uniq)))
    sim = np.zeros((V, V), np.float32)
    for a in range(V):
        wa, ba = agg_words[a], agg_bits[a]
        for b_i in range(a, V):
            common, ia, ib = np.intersect1d(wa, agg_words[b_i],
                                            assume_unique=True,
                                            return_indices=True)
            if len(common) == 0:
                continue
            u = (ba[ia] * agg_bits[b_i][ib]).sum(-1) / D
            u = np.where(np.abs(u) >= head.similarity_threshold, u, 0.0)
            s = float((np.sign(u) * np.abs(u) ** head.alpha).sum()
                      / (norms[a] * norms[b_i]))
            sim[a, b_i] = sim[b_i, a] = s
    return sim


def select_keyframes_linspace(n_views: int, num_keyframes) -> list[int]:
    """Uniform keyframe selection (reference panst3r.py:183-186)."""
    if num_keyframes is None or num_keyframes >= n_views:
        return list(range(n_views))
    return np.linspace(0, n_views - 1, num_keyframes, dtype=int).tolist()
