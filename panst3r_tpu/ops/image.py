"""Image resampling with torch semantics.

`jax.image.resize` antialiases when downscaling (kernel widened by the
scale factor); torch's `F.interpolate(mode='bilinear',
align_corners=False)` — used throughout the reference (model/dino.py:66,
upscalers/loftup.py:157, mask_transformer attn-mask downsampling,
engine/postprocess.py:19) — does NOT.  For weight-ported checkpoints the
difference is a real numerical divergence on every downscale, so the
framework uses this torch-exact bilinear implementation wherever the
reference interpolates.

Half-pixel source mapping: src = (dst + 0.5) * (in/out) - 0.5, clamped —
identical to both torch align_corners=False and jax's convention; only the
antialias filter differs.
"""
from __future__ import annotations

import jax.numpy as jnp


def _axis_lerp(out_size: int, in_size: int):
    # weights stay at the default float width (f64 under x64) — downcasting
    # to f32 breaks f64 parity tests (the LoftUp Fourier branch amplifies
    # input rounding by its max frequency e^10)
    c = (jnp.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    c = jnp.clip(c, 0.0, in_size - 1)
    lo = jnp.floor(c).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    return lo, hi, c - lo


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize WITHOUT antialiasing on (..., H, W, C) arrays —
    torch `F.interpolate(..., mode='bilinear', align_corners=False)`."""
    *lead, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x
    flat = x.reshape(-1, H, W, C)
    ly, hy, wy = _axis_lerp(out_h, H)
    lx, hx, wx = _axis_lerp(out_w, W)
    wy = wy[None, :, None, None].astype(flat.dtype)
    wx = wx[None, None, :, None].astype(flat.dtype)

    rows_lo = flat[:, ly]                       # (B, out_h, W, C)
    rows_hi = flat[:, hy]
    top = rows_lo[:, :, lx] * (1 - wx) + rows_lo[:, :, hx] * wx
    bot = rows_hi[:, :, lx] * (1 - wx) + rows_hi[:, :, hx] * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape(*lead, out_h, out_w, C)


def resize_bilinear_hw(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Same, for (..., H, W) arrays (no channel axis)."""
    return resize_bilinear(x[..., None], out_h, out_w)[..., 0]
