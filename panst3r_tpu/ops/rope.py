"""2D rotary position embedding ("RoPE100").

TPU-native replacement for the cuRoPE CUDA extension the reference installs
from croco (/root/reference/README.md:67-71) and selects via
`get_pos_embed('RoPE100')` (/root/reference/src/panst3r/model/input_mixer.py:16).

Semantics: the per-head feature dim D is split in two halves; the first half
is rotated by the token's integer y (row) position, the second by its x
(column) position.  Each half applies standard 1-D RoPE in "NeoX" layout
(rotate_half over concatenated halves, not interleaved pairs) with frequency
base 100.0.

Everything here is pure jnp — XLA fuses the elementwise rotation into the
surrounding matmuls; the Pallas attention kernel can also apply it inline
(see ops/pallas/flash_attention.py) to avoid materializing rotated q/k in HBM.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _inv_freq(half_dim: int, base: float) -> tuple:
    # 1 / base^(2i/D) for i in [0, D/2), D = half_dim (per-axis dim).
    import numpy as np

    return tuple(1.0 / (base ** (np.arange(0, half_dim, 2) / half_dim)))


def rope_cos_sin(positions: jnp.ndarray, dim: int, base: float = 100.0,
                 dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for 1-D RoPE.

    positions: (..., N) integer positions.  Returns cos, sin of shape
    (..., N, dim) where the frequency vector is repeated twice (NeoX layout).
    """
    inv = jnp.asarray(_inv_freq(dim, base), jnp.float32)
    ang = positions[..., None].astype(jnp.float32) * inv  # (..., N, dim/2)
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope_1d(tokens: jnp.ndarray, cos: jnp.ndarray,
                  sin: jnp.ndarray) -> jnp.ndarray:
    """tokens: (B, H, N, D); cos/sin: (B, N, D) broadcast over heads."""
    cos = cos[:, None]
    sin = sin[:, None]
    return tokens * cos + _rotate_half(tokens) * sin


def apply_rope_2d(tokens: jnp.ndarray, positions: jnp.ndarray,
                  base: float = 100.0) -> jnp.ndarray:
    """Apply 2-D RoPE.

    tokens: (B, heads, N, D) with D even; positions: (B, N, 2) int (y, x).
    First half of D rotated by y, second half by x (croco RoPE2D layout).
    """
    D = tokens.shape[-1]
    assert D % 4 == 0, "2D RoPE needs head_dim divisible by 4"
    y_tok, x_tok = jnp.split(tokens, 2, axis=-1)
    cos_y, sin_y = rope_cos_sin(positions[..., 0], D // 2, base, tokens.dtype)
    cos_x, sin_x = rope_cos_sin(positions[..., 1], D // 2, base, tokens.dtype)
    y_tok = apply_rope_1d(y_tok, cos_y, sin_y)
    x_tok = apply_rope_1d(x_tok, cos_x, sin_x)
    return jnp.concatenate([y_tok, x_tok], axis=-1)


def rope2d_tables(positions: jnp.ndarray, dim: int, base: float = 100.0,
                  dtype=jnp.float32):
    """Full-width cos/sin tables for 2D RoPE (table form used by the fused
    Pallas kernel): cos/sin (B, N, dim) with the y-axis tables in the first
    half and x-axis in the second."""
    cos_y, sin_y = rope_cos_sin(positions[..., 0], dim // 2, base, dtype)
    cos_x, sin_x = rope_cos_sin(positions[..., 1], dim // 2, base, dtype)
    return (jnp.concatenate([cos_y, cos_x], -1),
            jnp.concatenate([sin_y, sin_x], -1))


def _rotate_half_2d(x: jnp.ndarray) -> jnp.ndarray:
    """rotate_half applied within each (y, x) half of the last dim."""
    d = x.shape[-1]
    q = d // 4
    return jnp.concatenate(
        [-x[..., q:2 * q], x[..., :q], -x[..., 3 * q:], x[..., 2 * q:3 * q]],
        axis=-1)


def apply_rope_tables(tokens: jnp.ndarray, cos: jnp.ndarray,
                      sin: jnp.ndarray) -> jnp.ndarray:
    """Table form of apply_rope_2d: tokens (B, H, N, D), cos/sin (B, N, D).
    Identical to apply_rope_2d(tokens, positions) when the tables come from
    rope2d_tables(positions)."""
    cos = cos[:, None].astype(tokens.dtype)
    sin = sin[:, None].astype(tokens.dtype)
    return tokens * cos + _rotate_half_2d(tokens) * sin


class Rope2D:
    """Callable wrapper mirroring the reference's rope object interface."""

    def __init__(self, base: float = 100.0):
        self.base = base

    def __call__(self, tokens: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
        return apply_rope_2d(tokens, positions, self.base)


def patch_grid_positions(grid_h: int, grid_w: int) -> jnp.ndarray:
    """Integer (y, x) positions for an h×w patch grid, row-major: (h*w, 2)."""
    ys = jnp.arange(grid_h, dtype=jnp.int32)
    xs = jnp.arange(grid_w, dtype=jnp.int32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
