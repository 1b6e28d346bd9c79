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


# ------------------------------------------------------- YUV420 wire ----
# Serving input compression for slow host links: RGB uint8 uploads are
# 24 bits/pixel; JPEG-convention (full-range BT.601) YUV with 2x2-
# subsampled chroma is 12 — halving the 29.4 MB/scene upload of the
# 50-view regime (PERFORMANCE.md).  Pack layout (custom, slice-friendly):
# (H*3/2, W) uint8 = Y plane (H, W) on top; bottom (H/2, W) block holds
# the half-res U and V planes side by side [U | V].  Chroma is 2x2-mean
# subsampled on the host and nearest-upsampled on device; luma is exact
# to rounding, so gray content round-trips within 1/255.  Opt-in serving
# path (`InferenceEngine.serve_device` accepts the packed (V, H*3/2, W)
# array wherever it accepts (V, H, W, 3) RGB).

def rgb_to_yuv420(img):
    """Host-side pack: (..., H, W, 3) uint8 RGB → (..., H*3/2, W) uint8."""
    import numpy as np

    x = np.asarray(img, np.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    H, W = y.shape[-2:]
    lead = y.shape[:-2]

    def sub(c):        # 2x2 mean subsample
        c = c.reshape(*lead, H // 2, 2, W // 2, 2)
        return c.mean(axis=(-3, -1))

    cb2, cr2 = sub(cb), sub(cr)
    bottom = np.concatenate([cb2, cr2], axis=-1)       # (H/2, W)
    packed = np.concatenate([y, bottom], axis=-2)      # (H*3/2, W)
    return np.clip(np.rint(packed), 0, 255).astype(np.uint8)


def yuv420_to_rgb(packed):
    """Device-side unpack: (..., H*3/2, W) uint8 → f32 RGB in [0, 255]."""
    H = packed.shape[-2] * 2 // 3
    W = packed.shape[-1]
    p = packed.astype(jnp.float32)
    y = p[..., :H, :]
    bottom = p[..., H:, :]
    cb = bottom[..., :, :W // 2] - 128.0
    cr = bottom[..., :, W // 2:] - 128.0

    def up(c):         # nearest 2x upsample
        c = jnp.repeat(c, 2, axis=-1)
        return jnp.repeat(c, 2, axis=-2)

    cb, cr = up(cb), up(cr)
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)
