"""MUSt3R-style ViT image encoder.

TPU-native equivalent of the external `Dust3rEncoder` the reference
configures with `img_size=[512,512], patch_embed='PatchEmbedDust3R'`
(/root/reference/configs/base.yaml:7-10) and drives through
`inference_encoder` (/root/reference/src/panst3r/engine/must3r.py:9-26).
CroCo-style ViT-L/16: conv patch embed, 24 pre-norm blocks with 2D RoPE
(base 100), final LayerNorm.  Returns per-patch tokens (B, N, 1024) and
integer (y, x) patch positions (B, N, 2), matching the call surface the
reference consumes (x, pos pairs, SURVEY.md §2.1).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from panst3r_tpu.core import config as cfg
from panst3r_tpu.models.blocks import Block
from panst3r_tpu.ops.rope import patch_grid_positions


@cfg.register
@dataclasses.dataclass(frozen=True)
class ViTEncoderConfig:
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    rope_base: float = 100.0


class ViTEncoder(nn.Module):
    config: ViTEncoderConfig = ViTEncoderConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images: (B, H, W, 3) in dust3r normalization ([-1, 1]).

        Returns (tokens (B, N, C), pos (B, N, 2) int32).
        """
        c = self.config
        B, H, W, _ = images.shape
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embed")(images)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, c.embed_dim)
        pos = jnp.broadcast_to(patch_grid_positions(gh, gw)[None],
                               (B, gh * gw, 2))
        for i in range(c.depth):
            x = Block(c.num_heads, c.mlp_ratio, rope_base=c.rope_base,
                      name=f"block_{i}")(x, pos)
        x = nn.LayerNorm(name="norm")(x)
        return x, pos
