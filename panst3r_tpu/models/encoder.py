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
from panst3r_tpu.ops.rope import patch_grid_positions, rope2d_tables


@cfg.register
@dataclasses.dataclass(frozen=True)
class ViTEncoderConfig:
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    rope_base: float = 100.0


class _BlockStack(nn.Module):
    """scan body: one croco Block; params stack along the layer axis."""

    num_heads: int
    mlp_ratio: float
    rope_base: float

    @nn.compact
    def __call__(self, x, tabs):
        x = Block(self.num_heads, self.mlp_ratio, rope_base=self.rope_base,
                  name="block")(x, tabs=tabs)
        return x, None


class ViTEncoder(nn.Module):
    config: ViTEncoderConfig = ViTEncoderConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images: (B, H, W, 3) in dust3r normalization ([-1, 1]).

        Returns (tokens (B, N, C), pos (B, N, 2) int32).

        The 24 identical blocks run under ``nn.scan`` (params stacked on a
        leading layer axis at ``blocks/block``): one compiled block body
        instead of 24 inlined copies — the dominant train-step compile cost
        measured in round 2 (see PERFORMANCE.md).
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
        # RoPE tables are position-only — compute ONCE here and broadcast
        # into the layer scan (XLA cannot hoist them out of the while
        # body; the per-layer recompute measured ~0.26 ms/layer).
        tabs = rope2d_tables(pos, c.embed_dim // c.num_heads, c.rope_base)
        stack = nn.scan(_BlockStack, variable_axes={"params": 0},
                        split_rngs={"params": True}, in_axes=nn.broadcast,
                        length=c.depth)(c.num_heads, c.mlp_ratio,
                                        c.rope_base, name="blocks")
        x, _ = stack(x, tabs)
        x = nn.LayerNorm(name="norm")(x)
        return x, pos
