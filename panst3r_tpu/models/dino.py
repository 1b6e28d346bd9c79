"""DINOv2-style frozen semantic encoder.

TPU-native equivalent of the reference's HF `facebook/dinov2-large` wrapper
(/root/reference/src/panst3r/model/dino.py:49-71).  A plain ViT (patch 14,
learned position embeddings interpolated to the input grid, cls token) in
flax; the wrapper reproduces the reference's input contract exactly:

- input arrives in dust3r normalization ([-1, 1]) and is renormalized to
  ImageNet stats (dino.py:61-63);
- the image is bilinearly resized so the 14-px DINO grid has the same patch
  count as the 16-px MUSt3R grid: (h, w) = (H//16*14, W//16*14)
  (dino.py:65-66);
- the cls token is dropped from the output (dino.py:69).

Images are landscape-canonical (core/bucketing.py), which subsumes the
reference's `dinov2_transpose` landscape trick (dino.py:15-47).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from panst3r_tpu.core import config as cfg
from panst3r_tpu.models.blocks import Mlp, SelfAttention
from panst3r_tpu.ops.image import resize_bilinear

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


@cfg.register
@dataclasses.dataclass(frozen=True)
class DinoEncoderConfig:
    patch_size: int = 14
    embed_dim: int = 1024     # dinov2-large hidden size
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    pos_grid: int = 37        # 518/14 pretraining grid
    layerscale_init: float = 1e-5
    output_stride: int = 16   # MUSt3R patch size to align with


class _DinoBlock(nn.Module):
    num_heads: int
    mlp_ratio: float
    layerscale_init: float

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        g1 = self.param("ls1", nn.initializers.constant(self.layerscale_init),
                        (dim,))
        g2 = self.param("ls2", nn.initializers.constant(self.layerscale_init),
                        (dim,))
        x = x + g1 * SelfAttention(self.num_heads, rope_base=None,
                                   name="attn")(nn.LayerNorm(name="norm1")(x))
        x = x + g2 * Mlp(int(dim * self.mlp_ratio),
                         name="mlp")(nn.LayerNorm(name="norm2")(x))
        return x


class _DinoStack(nn.Module):
    """scan body: one DINOv2 block; params stack along the layer axis."""

    num_heads: int
    mlp_ratio: float
    layerscale_init: float

    @nn.compact
    def __call__(self, x):
        x = _DinoBlock(self.num_heads, self.mlp_ratio, self.layerscale_init,
                       name="block")(x)
        return x, None


class DinoEncoder(nn.Module):
    """Frozen ViT semantic encoder; returns patch tokens (B, N, C)."""

    config: DinoEncoderConfig = DinoEncoderConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) in dust3r normalization ([-1, 1])."""
        c = self.config
        # Constants in the image dtype: f32 literals would promote the
        # whole (frozen, bf16-cast) tower to f32 under amp — measured 96
        # → ~40 ms for 8 views on a v5e (PERFORMANCE.md round 2).
        mean = jnp.asarray(_IMAGENET_MEAN, images.dtype)
        std = jnp.asarray(_IMAGENET_STD, images.dtype)
        x = (images * 0.5 + 0.5 - mean) / std

        B, H, W, _ = x.shape
        th = H // c.output_stride * c.patch_size
        tw = W // c.output_stride * c.patch_size
        # torch-exact bilinear, no antialias (reference dino.py:66)
        x = resize_bilinear(x, th, tw)

        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, c.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, c.pos_grid * c.pos_grid + 1, c.embed_dim))
        patch_pos = pos[:, 1:].reshape(1, c.pos_grid, c.pos_grid, c.embed_dim)
        patch_pos = jax.image.resize(
            patch_pos, (1, gh, gw, c.embed_dim), method="bicubic")
        x = x + patch_pos.reshape(1, gh * gw, c.embed_dim)
        cls_tok = cls + pos[:, :1]
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (B, 1, c.embed_dim)), x],
                            axis=1)

        # 24 identical blocks under nn.scan (params stacked at
        # ``blocks/block`` — compile-time: one block body, not 24 copies).
        stack = nn.scan(_DinoStack, variable_axes={"params": 0},
                        split_rngs={"params": True},
                        length=c.depth)(c.num_heads, c.mlp_ratio,
                                        c.layerscale_init, name="blocks")
        x, _ = stack(x)
        x = nn.LayerNorm(name="norm")(x)
        return x[:, 1:]  # drop cls token (reference dino.py:69)
