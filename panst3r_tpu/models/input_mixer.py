"""InputMixer (v2 models): project concat features then mix with RoPE blocks.

Reference: /root/reference/src/panst3r/model/input_mixer.py:8-29 and
configs/base_v2.yaml:7-15 (2816 → 768, 3 self-attention blocks, RoPE100).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from panst3r_tpu.core import config as cfg
from panst3r_tpu.models.blocks import Block


@cfg.register
@dataclasses.dataclass(frozen=True)
class InputMixerConfig:
    hidden_dim: int = 768
    num_heads: int = 12
    num_layers: int = 3
    ff_dim_mult: float = 4.0
    rope_base: float = 100.0


class InputMixer(nn.Module):
    config: InputMixerConfig = InputMixerConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """x: (B, N, in_dim) concat features; pos: (B, N, 2)."""
        c = self.config
        x = nn.Dense(c.hidden_dim, name="in_proj")(x)
        for i in range(c.num_layers):
            x = Block(c.num_heads, c.ff_dim_mult, rope_base=c.rope_base,
                      name=f"mixer_blk_{i}")(x, pos)
        return nn.LayerNorm(name="mixer_norm")(x)
