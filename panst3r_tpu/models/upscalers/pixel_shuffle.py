"""PixelShuffle FPN upscaler (v1 models).

Reference: /root/reference/src/panst3r/model/upscalers/pixel_shuffle.py:9-59.
Gradual 2× upscaling: MLP → pixel-shuffle three times (stride 16 → 8 → 4
→ 2); returns `fpn=[f16]` (cross-attention features at stride 16) and
`mask_feats=f2` (stride-2 features for mask dot products).

TPU notes: everything is channels-last; each MLP is a (tokens × C) matmul
that maps straight onto the MXU, and pixel-shuffle is a free reshape/
transpose fused by XLA.  This is hot path #3 in the reference's training
profile (SURVEY.md §3.1).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from panst3r_tpu.core import config as cfg
from panst3r_tpu.models.blocks import Mlp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r²) → (B, H*r, W*r, C), channels-last."""
    B, H, W, Cr2 = x.shape
    C = Cr2 // (r * r)
    x = x.reshape(B, H, W, r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * r, W * r, C)


@cfg.register
@dataclasses.dataclass(frozen=True)
class PixelShuffleUpscalerConfig:
    patch_size: int = 16
    hidden_dim_factor: float = 4.0
    fp_dim: tuple = (768, 512, 384, 256)

    @property
    def fpn_dim(self) -> tuple:
        return (self.fp_dim[0],)

    @property
    def mask_dim(self) -> int:
        return self.fp_dim[3]


class PixelShuffleUpscaler(nn.Module):
    config: PixelShuffleUpscalerConfig = PixelShuffleUpscalerConfig()

    @nn.compact
    def __call__(self, feats: jnp.ndarray, images: jnp.ndarray,
                 grid: tuple[int, int]):
        """feats: (B, N, C) patch tokens; images unused here (LoftUp needs
        them — shared signature); grid: static (gh, gw).

        Returns (fpn: [f16 (B, gh, gw, 768)], mask_feats (B, gh*8, gw*8, 256)).
        """
        c = self.config
        B, N, C = feats.shape
        gh, gw = grid
        hf = c.hidden_dim_factor

        def proj(x, out_dim, name):
            return Mlp(int(hf * x.shape[-1]), out_features=out_dim,
                       name=name)(x)

        f8 = proj(feats, c.fp_dim[1] * 4, "proj_8").reshape(B, gh, gw, -1)
        f8 = pixel_shuffle(f8, 2)
        f4 = proj(f8, c.fp_dim[2] * 4, "proj_4")
        f4 = pixel_shuffle(f4, 2)
        f2 = proj(f4, c.fp_dim[3] * 4, "proj_2")
        f2 = pixel_shuffle(f2, 2)

        f16 = proj(feats, c.fp_dim[0], "proj_16").reshape(B, gh, gw, -1)
        return [f16], f2
