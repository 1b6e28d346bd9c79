"""Point sampling ops (PointRend-style mask supervision).

TPU-native equivalents of the reference's `point_sample` (a grid_sample
wrapper, /root/reference/src/panst3r/criterion/matcher.py:10-33) and
`get_uncertain_point_coords_with_randomness`
(/root/reference/src/panst3r/criterion/panoptic.py:410-463).

`point_sample` reproduces torch grid_sample semantics with
align_corners=False and zero padding: coords in [0, 1]² map to pixel centers
via x_pix = x·W − 0.5; out-of-bounds taps contribute zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(features: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at normalized [0,1]² points.

    features: (N, H, W) or (N, C, H, W); points: (N, P, 2) as (x, y) —
    matching grid_sample's (x, y) coordinate order in the reference.
    Returns (N, P) or (N, C, P).
    """
    squeeze = features.ndim == 3
    if squeeze:
        features = features[:, None]
    N, C, H, W = features.shape

    x = points[..., 0] * W - 0.5
    y = points[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    def tap(xi, yi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = features.reshape(N, C, H * W)
        idx = yi_c * W + xi_c                          # (N, P)
        vals = jnp.take_along_axis(flat, idx[:, None], axis=2)  # (N, C, P)
        return vals * (w * inb)[:, None]

    out = (tap(x0, y0, (1 - wx1) * (1 - wy1))
           + tap(x0 + 1, y0, wx1 * (1 - wy1))
           + tap(x0, y0 + 1, (1 - wx1) * wy1)
           + tap(x0 + 1, y0 + 1, wx1 * wy1))
    return out[:, 0] if squeeze else out


def point_sample_shared(features: jnp.ndarray,
                        points: jnp.ndarray) -> jnp.ndarray:
    """`point_sample` for points SHARED across the feature rows.

    features: (K, H, W); points: (P, 2) as (x, y) in [0, 1]² — one point
    set evaluated on every row (the reference matcher's shared per-view
    points, matcher.py:152-171).  Returns (K, P), bit-identical to
    ``point_sample(features, tile(points, (K, 1, 1)))``.

    TPU shape: per-row lane gathers lower to scalar-speed code (~58 ms
    at the matcher shape); with a shared index vector the same taps
    become axis-0 ROW gathers of the (H·W, K) transpose — contiguous
    (1, K) DMA slices — measured 27x faster (2.1 ms) and exact.
    """
    K, H, W = features.shape
    x = points[:, 0] * W - 0.5
    y = points[:, 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    ft = features.reshape(K, H * W).T                 # (HW, K)

    def tap(xi, yi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = jnp.take(ft, yi_c * W + xi_c, axis=0)  # (P, K)
        return vals * (w * inb)[:, None]

    out = (tap(x0, y0, (1 - wx1) * (1 - wy1))
           + tap(x0 + 1, y0, wx1 * (1 - wy1))
           + tap(x0, y0 + 1, (1 - wx1) * wy1)
           + tap(x0 + 1, y0 + 1, wx1 * wy1))
    return out.T


def uncertain_point_coords(key, logits: jnp.ndarray, num_points: int,
                           oversample_ratio: float,
                           importance_sample_ratio: float) -> jnp.ndarray:
    """Uncertainty-biased point sampling (reference panoptic.py:410-463).

    logits: (N, H, W) coarse mask logits.  Uncertainty = −|logit| at the
    *sampled* prediction (panoptic.py:439-446).  Returns (N, P, 2) (x, y).
    """
    N = logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(key)
    coords = jax.random.uniform(k1, (N, num_sampled, 2))
    point_logits = point_sample(logits, coords)        # (N, num_sampled)
    uncertainty = -jnp.abs(point_logits)

    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    idx = jax.lax.top_k(uncertainty, num_uncertain)[1]  # (N, num_uncertain)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if num_random > 0:
        rand = jax.random.uniform(k2, (N, num_random, 2))
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked
