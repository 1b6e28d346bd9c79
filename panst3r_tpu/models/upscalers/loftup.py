"""LoftUp upscaler (v2 models): Fourier-feature guidance branch + cross-
attention from high-res pixels into low-res patch features.

Reference: /root/reference/src/panst3r/model/upscalers/loftup.py (itself a
LoftUp adaptation): `MinMaxScaler` (:9-19), `ImplicitFeaturizer` (:21-79),
conv stem + 2 `CrossonlyDecoderBlock`s querying sine-PE'd patch features
(:132-182); output stride 2; returns `fpn=[patch_feats]` + upscaled
`mask_feats` (:184-190).

TPU notes: the cross-attention (Nq = H/2·W/2 queries, Nk = patch tokens)
dominates; it runs through the Pallas flash kernel.  Portrait guidance
transposition (:149-150) is subsumed by the landscape-canonical layout.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from panst3r_tpu.core import config as cfg
from panst3r_tpu.models.blocks import CrossonlyDecoderBlock
from panst3r_tpu.ops.image import resize_bilinear


class MinMaxScaler(nn.Module):
    @nn.compact
    def __call__(self, x):
        # Per-channel min/max over (batch, H, W) — reference loftup.py:14-19.
        mn = x.min(axis=(0, 1, 2), keepdims=True)
        mx = x.max(axis=(0, 1, 2), keepdims=True)
        return (x - mn) / jnp.clip(mx - mn, 1e-4) - 0.5


class ImplicitFeaturizer(nn.Module):
    """Coordinate (+RGB) Fourier features — reference loftup.py:21-79."""

    color_feats: bool = True
    n_freqs: int = 10
    learn_bias: bool = False

    @nn.compact
    def __call__(self, image):
        B, H, W, C = image.shape
        gh = jnp.linspace(-1, 1, H)
        gw = jnp.linspace(-1, 1, W)
        yy, xx = jnp.meshgrid(gh, gw, indexing="ij")
        coords = jnp.broadcast_to(
            jnp.stack([yy, xx], axis=-1)[None], (B, H, W, 2))
        feats = jnp.concatenate([coords, image], -1) if self.color_feats \
            else coords
        dm = feats.shape[-1]

        freqs = jnp.exp(jnp.linspace(-2.0, 10.0, self.n_freqs))
        # (B, H, W, n_freqs, dm)
        f = feats[..., None, :] * freqs[:, None]
        if self.learn_bias:
            biases = self.param("biases", nn.initializers.normal(1.0),
                                (2, dm, self.n_freqs))
            sin_f = f + biases[0].T
            cos_f = f + biases[1].T
        else:
            sin_f = cos_f = f
        sin_f = sin_f.reshape(B, H, W, self.n_freqs * dm)
        cos_f = cos_f.reshape(B, H, W, self.n_freqs * dm)
        parts = [jnp.sin(sin_f), jnp.cos(cos_f)]
        if self.color_feats:
            parts.append(image)
        return jnp.concatenate(parts, axis=-1)


@cfg.register
@dataclasses.dataclass(frozen=True)
class LoftUpUpscalerConfig:
    dim: int = 384
    output_stride: int = 2
    patch_size: int = 16
    color_feats: bool = True
    n_freqs: int = 20
    num_heads: int = 4
    num_layers: int = 2

    @property
    def fpn_dim(self) -> tuple:
        return (768,)  # patch_embed keeps the input (mixer) dim

    @property
    def mask_dim(self) -> int:
        return self.dim


class LoftUpUpscaler(nn.Module):
    config: LoftUpUpscalerConfig = LoftUpUpscalerConfig()

    @nn.compact
    def __call__(self, feats: jnp.ndarray, images: jnp.ndarray,
                 grid: tuple[int, int]):
        """feats: (B, N, C) patch tokens; images: (B, H, W, 3) guidance;
        grid: static (gh, gw).

        Returns (fpn: [patch feats (B, gh, gw, C)],
                 mask_feats (B, H/stride, W/stride, dim)).
        """
        c = self.config
        B, N, C = feats.shape
        gh, gw = grid
        lr = feats.reshape(B, gh, gw, C)
        patch_feats = nn.Conv(C, (1, 1), name="patch_embed")(lr)

        # Guidance branch: downscale, Fourier featurize, conv stem.
        H, W = images.shape[1:3]
        hout, wout = H // c.output_stride, W // c.output_stride
        # torch-exact bilinear (no antialias) — reference loftup.py:157
        img = resize_bilinear(images, hout, wout)
        x = MinMaxScaler(name="minmax")(img)
        x = ImplicitFeaturizer(c.color_feats, c.n_freqs, learn_bias=True,
                               name="fourier")(x)
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="gn0")(x)
        x = nn.Conv(c.dim, (3, 3), padding="SAME", name="conv1")(x)
        x = nn.relu(nn.GroupNorm(num_groups=8, epsilon=1e-5, name="gn1")(x))
        x = nn.Conv(c.dim, (3, 3), padding="SAME", name="conv2")(x)
        x = nn.relu(nn.GroupNorm(num_groups=8, epsilon=1e-5, name="gn2")(x))
        x = x.reshape(B, hout * wout, c.dim)

        # Low-res branch: sine coordinate PE concat + projection.
        lr_pe = ImplicitFeaturizer(False, 5, learn_bias=True,
                                   name="lr_pe")(lr)
        lr_cat = jnp.concatenate([lr, lr_pe], axis=-1).reshape(
            B, gh * gw, -1)
        lr_tokens = nn.LayerNorm(epsilon=1e-5, name="lr_proj_norm")(
            nn.Dense(c.dim, name="lr_proj")(lr_cat))

        for i in range(c.num_layers):
            x, _ = CrossonlyDecoderBlock(c.num_heads, mlp_ratio=1.0,
                                         name=f"ca_block_{i}")(x, lr_tokens)
        x = nn.LayerNorm(epsilon=1e-5, name="ca_norm")(x)
        mask_feats = x.reshape(B, hout, wout, c.dim)
        return [patch_feats], mask_feats
