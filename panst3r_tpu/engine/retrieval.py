"""Keyframe retrieval: pairwise view similarity + FPS + greedy ordering.

The reference uses an ASMK inverted-file index (Cython + FAISS GPU) over
whitened MUSt3R encoder features (/root/reference/src/panst3r/engine/
retrieval.py:12-47) purely to produce an N×N similarity matrix for a few
hundred views, then farthest-point-samples keyframes and orders them by
greedy max-overlap (panst3r.py:88-125).  At these scales an IVF index is
overkill on TPU: similarity is one (N, D)·(D, N) matmul of pooled,
L2-normalized encoder tokens — MXU-friendly, no index to build.

The FPS + greedy ordering logic reproduces the reference exactly.
"""
from __future__ import annotations

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
    min_d = dist[start].copy()
    for _ in range(n - 1):
        nxt = int(np.argmax(min_d))
        if dist_thresh is not None and min_d[nxt] < dist_thresh:
            break
        selected.append(nxt)
        min_d = np.minimum(min_d, dist[nxt])
    return selected


def select_keyframes_retrieval(tokens, num_keyframes: int) -> list[int]:
    """Keyframe selection by retrieval (reference panst3r.py:88-125):
    FPS over (1 − sim) for coverage, then greedy max-overlap ordering so the
    memory is built connected-first."""
    sim = np.asarray(view_similarity(tokens))
    anchor_idx = farthest_point_sampling(1.0 - sim, num_keyframes)
    sub = sim[np.ix_(anchor_idx, anchor_idx)].copy()
    np.fill_diagonal(sub, 0.0)

    sim_sum = sub.sum(-1)
    order = [int(np.argmax(sim_sum))]     # highest total overlap first (:111)
    sub[:, order[0]] = 0.0
    while len(order) < len(anchor_idx):
        rows = sub[np.asarray(order)]
        nxt = int(np.unravel_index(np.argmax(rows), rows.shape)[1])  # :117-119
        order.append(nxt)
        sub[:, nxt] = 0.0
    return [anchor_idx[k] for k in order]


def select_keyframes_linspace(n_views: int, num_keyframes) -> list[int]:
    """Uniform keyframe selection (reference panst3r.py:183-186)."""
    if num_keyframes is None or num_keyframes >= n_views:
        return list(range(n_views))
    return np.linspace(0, n_views - 1, num_keyframes, dtype=int).tolist()
