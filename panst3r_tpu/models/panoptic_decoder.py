"""Panoptic head wrapper: feature concat → (mixer) → upscaler → mask
transformer.

TPU-native equivalent of /root/reference/src/panst3r/model/panoptic_decoder.py:
concat (must3r encoder x: 1024, must3r decoder y: 768, dino: 1024) per patch
(:43-47), optional InputMixer (v2), upscaler, open-vocab text embeddings
(+ learned `nocls_token` in softmax mode, :30-31,65-66), MaskTransformer; and
the `memory_queries` fast path that skips query decoding and reuses keyframe
queries through the prediction heads only (:68-76).

Text embeddings are computed host-side (models/text_encoder.py) and passed in
as an array — the text tower is not part of the jitted graph, mirroring how
`fixed_vocab` frees the tower in the reference (text_encoder.py:82-92).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from panst3r_tpu.core import config as cfg
from panst3r_tpu.models.input_mixer import InputMixer, InputMixerConfig
from panst3r_tpu.models.mask_transformer import (MaskTransformer,
                                                 MaskTransformerConfig)
from panst3r_tpu.models.upscalers import (LoftUpUpscaler,
                                          LoftUpUpscalerConfig,
                                          PixelShuffleUpscaler,
                                          PixelShuffleUpscalerConfig)


@cfg.register
@dataclasses.dataclass(frozen=True)
class PanopticDecoderConfig:
    input_mixer: Optional[InputMixerConfig] = None        # v2 only
    upscaler: Union[PixelShuffleUpscalerConfig, LoftUpUpscalerConfig] = \
        PixelShuffleUpscalerConfig()
    mask_transformer: MaskTransformerConfig = MaskTransformerConfig()
    label_mode: str = "sigmoid"                           # or 'softmax'
    text_embed_dim: int = 768
    deep_supervision: bool = True

    def __post_init__(self):
        assert self.label_mode in ("sigmoid", "softmax")


class PanopticDecoder(nn.Module):
    config: PanopticDecoderConfig = PanopticDecoderConfig()

    def setup(self):
        c = self.config
        if c.input_mixer is not None:
            self.input_mixer = InputMixer(c.input_mixer)
        if isinstance(c.upscaler, LoftUpUpscalerConfig):
            self.upscaler = LoftUpUpscaler(c.upscaler)
        else:
            self.upscaler = PixelShuffleUpscaler(c.upscaler)
        self.mask_transformer = MaskTransformer(c.mask_transformer)
        if c.label_mode == "softmax":
            self.nocls_token = self.param(
                "nocls_token", nn.initializers.normal(1.0),
                (c.text_embed_dim,))

    def _features(self, in_feats: Sequence[jnp.ndarray], images: jnp.ndarray,
                  pos: jnp.ndarray, grid: tuple[int, int]):
        """Concat → mixer → upscaler, per view.  All (B, V, ...) inputs."""
        cat = jnp.concatenate(in_feats, axis=-1)          # (B, V, N, 2816)
        B, V, N, C = cat.shape
        flat = cat.reshape(B * V, N, C)
        if self.config.input_mixer is not None:
            flat = self.input_mixer(flat, pos.reshape(B * V, N, 2))
        fpn, mask_f = self.upscaler(
            flat, images.reshape(B * V, *images.shape[2:]), grid)
        fpn = [f.reshape(B, V, *f.shape[1:]) for f in fpn]
        mask_f = mask_f.reshape(B, V, *mask_f.shape[1:])
        return fpn, mask_f

    def _cls_embeddings(self, cls_embeddings: jnp.ndarray) -> jnp.ndarray:
        if self.config.label_mode == "softmax":
            return jnp.concatenate(
                [cls_embeddings, self.nocls_token[None]], axis=0)
        return cls_embeddings

    def __call__(self, in_feats: Sequence[jnp.ndarray], images: jnp.ndarray,
                 pos: jnp.ndarray, portrait: jnp.ndarray,
                 cls_embeddings: jnp.ndarray, grid: tuple[int, int],
                 memory_queries: Optional[jnp.ndarray] = None,
                 deep_supervision: Optional[bool] = None):
        """in_feats: tuple of (B, V, N, C_i) to concat (x_must3r, y_must3r,
        x_dino); images: (B, V, H, W, 3); pos: (B, V, N, 2); portrait:
        (B, V) bool; cls_embeddings: (num_classes, lang_dim); grid: static
        patch grid (gh, gw)."""
        multi_bucket = isinstance(images, (list, tuple))
        if multi_bucket:
            # Per-bucket feature extraction; joint decoding downstream
            # (the reference's multi-AR path, panoptic_decoder.py:44-47 +
            # mask_transformer multi-AR assembly).
            fpn_b, mask_f = [], []
            for feats_b, img_b, pos_b, grid_b in zip(
                    zip(*in_feats), images, pos, grid):
                fpn_i, mf_i = self._features(feats_b, img_b, pos_b, grid_b)
                fpn_b.append(fpn_i)
                mask_f.append(mf_i)
            # levels × buckets
            fpn = [[fpn_b[bkt][lvl] for bkt in range(len(fpn_b))]
                   for lvl in range(len(fpn_b[0]))]
        else:
            fpn, mask_f = self._features(in_feats, images, pos, grid)
        cls_emb = self._cls_embeddings(cls_embeddings)
        if deep_supervision is None:
            deep_supervision = self.config.deep_supervision

        if memory_queries is None:
            return self.mask_transformer(
                fpn, mask_f, cls_emb, portrait,
                deep_supervision=deep_supervision)
        return self.mask_transformer.decode_with_queries(
            memory_queries, mask_f, cls_emb)
