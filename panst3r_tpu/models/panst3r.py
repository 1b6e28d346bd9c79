"""The composite PanSt3R model.

TPU-native equivalent of /root/reference/src/panst3r/panst3r.py:19-325.
Owns the MUSt3R-style encoder/decoder, the DINO semantic encoder and the
panoptic head; orchestrates the training forward (reference :286-296):

    dino + encoder → incremental memory build (init 2 views, then +1 at a
    time — reference get_must3r_mem_batches :65-70) → render all views
    against the full memory → panoptic head.

Inference-time keyframe logic (reorder, memory on keyframes, per-frame
render-only decode — reference forward_inference_multi_ar :169-284) lives in
engine/inference.py, which drives the stage methods below as separately
jitted functions so each stage compiles once per bucket.

Checkpoint reconstruction uses the declarative config tree
(core/config.py) instead of the reference's `eval()` of architecture strings
(:301-325).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from panst3r_tpu.core import config as cfg
from panst3r_tpu.models import memory as memlib
from panst3r_tpu.models.decoder import MemoryDecoder, MemoryDecoderConfig
from panst3r_tpu.models.dino import DinoEncoder, DinoEncoderConfig
from panst3r_tpu.models.encoder import ViTEncoder, ViTEncoderConfig
from panst3r_tpu.models.panoptic_decoder import (PanopticDecoder,
                                                 PanopticDecoderConfig)


@cfg.register
@dataclasses.dataclass(frozen=True)
class PanSt3RConfig:
    encoder: ViTEncoderConfig = ViTEncoderConfig()
    decoder: MemoryDecoderConfig = MemoryDecoderConfig()
    dino: DinoEncoderConfig = DinoEncoderConfig()
    panoptic: PanopticDecoderConfig = PanopticDecoderConfig()
    init_num_views: int = 2     # reference must3r_params (:35-39)
    batch_num_views: int = 1
    # Freeze policy (reference train.py:219-222: dino always frozen; the
    # must3r encoder/decoder frozen unless finetune flags set).  Implemented
    # as stop_gradient at the stage boundary so XLA dead-code-eliminates the
    # whole frozen backward pass.
    freeze_encoder: bool = True
    freeze_decoder: bool = True
    freeze_dino: bool = True

    def mem_batches(self, n_views: int) -> list[int]:
        """[2, 1, 1, ...] memory injection schedule (reference :65-70)."""
        batches = [min(self.init_num_views, n_views)]
        while sum(batches) < n_views:
            batches.append(min(self.batch_num_views, n_views - sum(batches)))
        return batches


class PanSt3R(nn.Module):
    config: PanSt3RConfig = PanSt3RConfig()
    # Optional NamedSharding for the decoder KV memory banks (capacity axis
    # over the mesh 'mem' axis) — see ops/sharded_attention.py.
    kv_shard: Optional[object] = None

    def setup(self):
        c = self.config
        self.must3r_encoder = ViTEncoder(c.encoder)
        self.must3r_decoder = MemoryDecoder(c.decoder, kv_shard=self.kv_shard)
        self.dino_encoder = DinoEncoder(c.dino)
        self.panoptic_decoder = PanopticDecoder(c.panoptic)

    # ---- stage methods (engine-jittable via apply(method=...)) ----

    def encode(self, images: jnp.ndarray):
        """images: (B, V, H, W, 3) → tokens (B, V, N, C), pos (B, V, N, 2)."""
        B, V = images.shape[:2]
        x, pos = self.must3r_encoder(images.reshape(B * V, *images.shape[2:]))
        return (x.reshape(B, V, *x.shape[1:]),
                pos.reshape(B, V, *pos.shape[1:]))

    def encode_dino(self, images: jnp.ndarray):
        B, V = images.shape[:2]
        out = self.dino_encoder(images.reshape(B * V, *images.shape[2:]))
        return out.reshape(B, V, *out.shape[1:])

    def decoder_update(self, x, pos, mem, grid):
        return self.must3r_decoder(x, pos, mem, render=False, grid=grid)

    def decoder_update_feedback(self, x, pos, mem, grid, feedback_feats):
        """Memory update with decoder feedback (refinement passes —
        feedback_type='single_mlp', reference num_refinements_iterations)."""
        return self.must3r_decoder(x, pos, mem, render=False, grid=grid,
                                   feedback_feats=feedback_feats)

    def decoder_render(self, x, pos, mem, grid):
        _, pointmaps, feats = self.must3r_decoder(x, pos, mem, render=True,
                                                  grid=grid)
        return pointmaps, feats

    def panoptic(self, in_feats, images, pos, portrait, cls_embeddings, grid,
                 memory_queries=None, deep_supervision=None):
        return self.panoptic_decoder(in_feats, images, pos, portrait,
                                     cls_embeddings, grid,
                                     memory_queries=memory_queries,
                                     deep_supervision=deep_supervision)

    # ---- full training forward (reference forward :286-296) ----

    def __call__(self, images: jnp.ndarray, portrait: jnp.ndarray,
                 cls_embeddings: jnp.ndarray, grid: tuple[int, int]):
        """images: (B, V, H, W, 3) landscape-canonical, dust3r-normalized;
        portrait: (B, V) bool; cls_embeddings: (num_classes, lang_dim);
        grid: static (gh, gw) = (H//16, W//16).

        Returns (panout dict, pointmaps_raw (B, V, H, W, 7)).
        """
        c = self.config
        B, V = images.shape[:2]
        N = grid[0] * grid[1]

        sg = jax.lax.stop_gradient
        x_dino = self.encode_dino(images)
        if c.freeze_dino:
            x_dino = sg(x_dino)
        x, pos = self.encode(images)
        if c.freeze_encoder:
            x = sg(x)

        # Incremental memory build over the injection schedule.
        mem = memlib.init_memory(c.decoder.depth, B, V * N, c.decoder.dim,
                                 dtype=x.dtype)
        start = 0
        for nb in c.mem_batches(V):
            xi = x[:, start:start + nb]
            posi = pos[:, start:start + nb]
            mem, _, _ = self.decoder_update(xi, posi, mem, grid)
            start += nb

        pointmaps, y = self.decoder_render(x, pos, mem, grid)
        if c.freeze_decoder:
            y = sg(y)
            pointmaps = sg(pointmaps)

        panout = self.panoptic((x, y, x_dino), images, pos, portrait,
                               cls_embeddings, grid)
        return panout, pointmaps
