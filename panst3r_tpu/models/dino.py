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
from panst3r_tpu.models.blocks import (Mlp, SelfAttention, _merge_heads,
                                       _split_heads)
from panst3r_tpu.ops.attention import flash_attention_split_cls
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
    # Carry the cls token as a separate (B, 1, C) stream through the
    # blocks (exact math via a rank-1 softmax fixup) instead of
    # concatenating to N+1 tokens: the 769-token grid otherwise lane-pads
    # to 896 inside attention (xplane round 4: 0.57 vs ~0.42 ms/layer).
    # Same param tree either way — checkpoints are interchangeable.
    split_cls: bool = True


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


class _SplitClsSelfAttention(nn.Module):
    """SelfAttention with the cls token as a separate stream.  Identical
    param tree to SelfAttention (qkv/proj) — the shared Dense modules are
    applied to both streams; the joint softmax over N+1 keys is computed
    exactly by flash_attention_split_cls."""

    num_heads: int

    @nn.compact
    def __call__(self, x, c):
        C = x.shape[-1]
        qkv = nn.Dense(3 * C, use_bias=True, name="qkv")
        proj = nn.Dense(C, name="proj")
        qkv_x = qkv(x)
        qkv_c = qkv(c)

        from panst3r_tpu.ops.attention import _use_pallas
        from panst3r_tpu.ops.pallas.tower_attention import (
            supports_tower_attention, tower_self_attention)
        if _use_pallas() and supports_tower_attention(x.shape[1], C,
                                                      self.num_heads):
            # Transpose-free kernel; the cls KEY/VALUE joins every patch
            # query's softmax inside the kernel (exact).  The cls QUERY
            # row is one (1, N+1) softmax — jnp, with reshape-view (no
            # transpose) head splits.
            B, N = x.shape[:2]
            H = self.num_heads
            D = C // H
            out_p = tower_self_attention(
                qkv_x, H, cls_kv=(qkv_c[..., C:2 * C], qkv_c[..., 2 * C:]))

            # The cls row rides the MXU in the NATIVE (B, N, C) layout.
            # Head-batched einsums/reductions here were measured
            # materializing full f32 copies of k/v plus {1,2,0} layout
            # round-trips inside the 24-layer scan (~40 ms per 50-view
            # scene, r5 xplane).  Instead: embed the cls query as a
            # block-diagonal (C, H) weight so the per-head scores are ONE
            # bf16 matmul against the un-split k slice, and recover the
            # output row from a (B,H,N)x(B,N,C) contraction's diagonal
            # head blocks — 2·B·N·C·H extra MXU flops (~1.3 GF at the
            # 50-view shape, negligible) and zero big-tensor relayouts.
            scale = D ** -0.5
            f32 = jnp.float32
            dt = qkv_x.dtype
            q_c = qkv_c[..., :C].reshape(B, H, D)
            k_c = qkv_c[..., C:2 * C].reshape(B, H, D)
            v_c = qkv_c[..., 2 * C:].reshape(B, H, D)
            eye = jnp.eye(H, dtype=dt)
            # W[b, h*D+d, h'] = q_c[b, h, d] * δ(h, h')
            W = (q_c[:, :, :, None].astype(dt)
                 * eye[None, :, None, :]).reshape(B, C, H)
            s_p = jax.lax.dot_general(
                qkv_x[..., C:2 * C], W, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32) * scale         # (B, N, H)
            s_cc = (k_c.astype(f32)
                    * q_c.astype(f32)).sum(-1) * scale      # (B, H)
            m = jnp.maximum(s_p.max(1), s_cc)               # (B, H)
            e_p = jnp.exp(s_p - m[:, None])                 # (B, N, H) f32
            e_c = jnp.exp(s_cc - m)                         # (B, H)
            l = e_p.sum(1) + e_c                            # (B, H)
            # (B, H, N) x (B, N, C) -> (B, H, C); head h's value block is
            # the (h, h) diagonal of its (H, D) column grouping.
            out_full = jax.lax.dot_general(
                e_p.transpose(0, 2, 1).astype(dt), qkv_x[..., 2 * C:],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)                 # (B, H, C)
            out_diag = (out_full.reshape(B, H, H, D)
                        * eye[None, :, :, None].astype(f32)).sum(2)
            out_c = (out_diag + e_c[..., None] * v_c.astype(f32)) \
                / l[..., None]                              # (B, H, D)
            out_c = out_c.reshape(B, 1, C).astype(out_p.dtype)
            return proj(out_p), proj(out_c)

        xq, xk, xv = (_split_heads(t, self.num_heads)
                      for t in jnp.split(qkv_x, 3, axis=-1))
        cq, ck, cv = (_split_heads(t, self.num_heads)
                      for t in jnp.split(qkv_c, 3, axis=-1))
        out_p, out_c = flash_attention_split_cls(xq, xk, xv, cq, ck, cv)
        return proj(_merge_heads(out_p)), proj(_merge_heads(out_c))


class _DinoBlockSplit(nn.Module):
    """_DinoBlock over (patches, cls) streams; same param tree."""

    num_heads: int
    mlp_ratio: float
    layerscale_init: float

    @nn.compact
    def __call__(self, x, c):
        dim = x.shape[-1]
        g1 = self.param("ls1", nn.initializers.constant(self.layerscale_init),
                        (dim,))
        g2 = self.param("ls2", nn.initializers.constant(self.layerscale_init),
                        (dim,))
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        attn = _SplitClsSelfAttention(self.num_heads, name="attn")
        mlp = Mlp(int(dim * self.mlp_ratio), name="mlp")
        ax, ac = attn(norm1(x), norm1(c))
        x = x + g1 * ax
        c = c + g1 * ac
        x = x + g2 * mlp(norm2(x))
        c = c + g2 * mlp(norm2(c))
        return x, c


class _DinoStackSplit(nn.Module):
    num_heads: int
    mlp_ratio: float
    layerscale_init: float

    @nn.compact
    def __call__(self, xc):
        x, c = xc
        x, c = _DinoBlockSplit(self.num_heads, self.mlp_ratio,
                               self.layerscale_init, name="block")(x, c)
        return (x, c), None


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
        cls_tok = jnp.broadcast_to(cls + pos[:, :1], (B, 1, c.embed_dim))

        # 24 identical blocks under nn.scan (params stacked at
        # ``blocks/block`` — compile-time: one block body, not 24 copies).
        if c.split_cls:
            stack = nn.scan(_DinoStackSplit, variable_axes={"params": 0},
                            split_rngs={"params": True},
                            length=c.depth)(c.num_heads, c.mlp_ratio,
                                            c.layerscale_init, name="blocks")
            (x, _cls), _ = stack((x, cls_tok.astype(x.dtype)))
            # final LN is per-token; the dropped cls never needs it
            return nn.LayerNorm(name="norm")(x)
        x = jnp.concatenate([cls_tok.astype(x.dtype), x], axis=1)
        stack = nn.scan(_DinoStack, variable_axes={"params": 0},
                        split_rngs={"params": True},
                        length=c.depth)(c.num_heads, c.mlp_ratio,
                                        c.layerscale_init, name="blocks")
        x, _ = stack(x)
        x = nn.LayerNorm(name="norm")(x)
        return x[:, 1:]  # drop cls token (reference dino.py:69)
