"""MUSt3R-style multi-view decoder with cross-view token memory.

TPU-native equivalent of the external `MUSt3R` decoder the reference
configures with `feedback_type='single_mlp', memory_mode='norm_y'`
(/root/reference/configs/base.yaml:11-15) and calls as
`decoder(x, pos, true_shape, mem, render, return_feats) -> (mem, pointmaps,
feats)` (/root/reference/src/panst3r/engine/must3r.py:45,93,116-120).

Two modes, one code path:

- **update** (``render=False``): a batch of V views is injected.  At every
  layer each view self-attends over its own tokens and cross-attends into
  [existing memory ‖ the current batch's own normalized tokens] — so views
  injected together see each other (the reference initializes with 2 views
  jointly, then +1 at a time: panst3r.py:35-39,65-70).  The normalized
  per-layer tokens are appended to the fixed-capacity memory
  (models/memory.py).
- **render** (``render=True``): identical compute against a frozen memory,
  nothing appended — the O(1)-per-frame decode used for non-keyframes
  (engine/must3r.py:71-129).

The pointmap head predicts per-pixel global pts3d (world = first-camera
frame), local pts3d (own-camera frame) and confidence — 7 channels —
decoded from patch tokens (dust3r-style linear head + 'exp' activation;
consumed via `postprocess` as in tools/demo_panst3r.py:220-221,246).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from panst3r_tpu.core import config as cfg
from panst3r_tpu.models import memory as memlib
from panst3r_tpu.models.blocks import CrossAttention, Mlp, SelfAttention
from panst3r_tpu.models.memory import TokenMemory
from panst3r_tpu.ops.attention import memory_mask_bias
from panst3r_tpu.ops.rope import rope2d_tables


@cfg.register
@dataclasses.dataclass(frozen=True)
class MemoryDecoderConfig:
    enc_dim: int = 1024
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    patch_size: int = 16
    feedback: str = "single_mlp"  # feedback_type (configs/base.yaml:14)
    head_channels: int = 7        # 3 global + 3 local + 1 conf


class _DecoderLayer(nn.Module):
    """scan body: one memory-decoder layer.

    Carry: x (B, V, N, dim).  Scanned input: this layer's memory bank
    (B, M, dim) — ``mem.y`` is already stacked (depth, B, M, dim), the
    natural scan layout.  Scanned output: the layer's norm_y tokens (the
    memory write for update mode).  Params stack at ``layers/*``.
    """

    dim: int
    num_heads: int
    mlp_ratio: float
    rope_base: float
    render: bool
    kv_shard: Optional[object] = None

    @nn.compact
    def __call__(self, x, mem_y_l, tabs_self, tabs_q, tabs_mem, mem_bias,
                 upd_bias, tabs_kv):
        """RoPE enters as precomputed (cos, sin) tables — position-only
        and loop-invariant, so MemoryDecoder computes them once outside
        the layer scan (XLA cannot hoist out of the while body)."""
        B, V, N, _ = x.shape
        y_cur = nn.LayerNorm(name="norm_y")(x)       # memory_mode=norm_y
        if not self.render:
            kv = jnp.concatenate(
                [mem_y_l.astype(x.dtype), y_cur.reshape(B, V * N, -1)],
                axis=1)
            bias, ktab = upd_bias, tabs_kv
        else:
            kv = mem_y_l.astype(x.dtype)
            if self.kv_shard is not None:
                kv = jax.lax.with_sharding_constraint(kv, self.kv_shard)
            bias, ktab = mem_bias, tabs_mem

        # Self-attention within each view.
        xv = x.reshape(B * V, N, -1)
        xv = xv + SelfAttention(self.num_heads, rope_base=self.rope_base,
                                name="self_attn")(
            nn.LayerNorm(name="norm1")(xv), tabs=tabs_self)
        x = xv.reshape(B, V * N, -1)
        # Cross-attention into the token memory (joint over views).
        x = x + CrossAttention(self.num_heads, rope_base=self.rope_base,
                               name="cross_attn")(
            nn.LayerNorm(name="norm2")(x), kv, kv,
            qtab=tabs_q, ktab=ktab, bias=bias)
        x = x + Mlp(int(self.dim * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(name="norm3")(x))
        return x.reshape(B, V, N, -1), y_cur


class MemoryDecoder(nn.Module):
    config: MemoryDecoderConfig = MemoryDecoderConfig()
    # Optional NamedSharding for the per-layer KV bank (B, capacity, C):
    # capacity sharded over the mesh 'mem' axis.  GSPMD then partitions the
    # memory cross-attention across devices (ops/sharded_attention.py
    # documents the schedule XLA derives).
    kv_shard: Optional[object] = None

    @nn.compact
    def __call__(self, x_enc: jnp.ndarray, pos: jnp.ndarray,
                 mem: TokenMemory, render: bool,
                 grid: tuple[int, int],
                 feedback_feats: Optional[jnp.ndarray] = None):
        """x_enc: (B, V, N, enc_dim); pos: (B, V, N, 2) int32;
        grid: static (gh, gw) with gh*gw == N.

        Returns (new_mem, pointmaps_raw (B, V, H, W, 7), feats (B, V, N, dim)).
        """
        c = self.config
        B, V, N, _ = x_enc.shape
        gh, gw = grid
        assert gh * gw == N, (grid, N)

        tokens = nn.Dense(c.dim, name="decoder_embed")(x_enc)
        if c.feedback == "single_mlp":
            # Refinement passes re-inject the previous final features
            # (feedback_type='single_mlp'; unused at 0 refinement iterations
            # as in the reference default, num_refinements_iterations=0).
            # The MLP params are created unconditionally (dummy call) so
            # checkpoints carry them whether or not refinement is used.
            fb_mlp = Mlp(c.dim * 2, out_features=c.dim, name="feedback_mlp")
            if feedback_feats is not None:
                tokens = tokens + fb_mlp(feedback_feats)
            else:
                _ = fb_mlp(jnp.zeros((1, 1, c.dim), tokens.dtype))

        flat_pos = pos.reshape(B, V * N, 2)
        mem_bias = memory_mask_bias(mem.valid)          # (B,1,1,M)
        zeros_cur = jnp.zeros((B, 1, 1, V * N), mem_bias.dtype)
        upd_bias = jnp.concatenate([mem_bias, zeros_cur], axis=-1)
        kv_pos = jnp.concatenate([mem.pos, flat_pos], axis=1)

        # RoPE tables once per forward, shared by all 12 scanned layers.
        hd = c.dim // c.num_heads
        tabs_self = rope2d_tables(pos.reshape(B * V, N, 2), hd, c.rope_base)
        tabs_q = rope2d_tables(flat_pos, hd, c.rope_base)
        tabs_mem = rope2d_tables(mem.pos, hd, c.rope_base)
        tabs_kv = (None if render
                   else rope2d_tables(kv_pos, hd, c.rope_base))

        # 12 identical layers under nn.scan: carry x, scan over the
        # per-layer memory banks (mem.y is (depth, B, M, dim)), collect
        # each layer's norm_y tokens as the stacked memory write.
        layers = nn.scan(
            _DecoderLayer, variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0,) + (nn.broadcast,) * 6,
            length=c.depth)(c.dim, c.num_heads, c.mlp_ratio, c.rope_base,
                            render, self.kv_shard, name="layers")
        x, new_y = layers(tokens, mem.y, tabs_self, tabs_q, tabs_mem,
                          mem_bias, upd_bias, tabs_kv)

        feats = nn.LayerNorm(name="norm")(x)             # (B, V, N, dim)

        if not render:
            y_stack = new_y.reshape(c.depth, B, V * N, c.dim)
            mem = memlib.insert(mem, y_stack, flat_pos)

        # Pointmap head: per-patch linear → unpatchify.
        p = c.patch_size
        headout = nn.Dense(p * p * c.head_channels, name="head")(feats)
        headout = headout.reshape(B, V, gh, gw, p, p, c.head_channels)
        headout = headout.transpose(0, 1, 2, 4, 3, 5, 6)
        pointmaps = headout.reshape(B, V, gh * p, gw * p, c.head_channels)

        return mem, pointmaps, feats


def postprocess(pointmaps_raw: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Raw head output → activated pts3d / pts3d_local / conf.

    dust3r-style 'exp' activation: direction preserved, radial distance
    mapped through expm1 (positive, unbounded); confidence 1 + exp(raw)
    (>= 1, used as weights-minus-one downstream, demo_panst3r.py:271).
    Reference surface: must3r `postprocess(x, pointmaps_activation)`
    (tools/demo_panst3r.py:29,221,246).
    """

    def _exp_pts(raw):
        d = jnp.linalg.norm(raw, axis=-1, keepdims=True)
        return raw * (jnp.expm1(d) / jnp.maximum(d, 1e-8))

    pts3d = _exp_pts(pointmaps_raw[..., 0:3])
    pts3d_local = _exp_pts(pointmaps_raw[..., 3:6])
    conf = 1.0 + jnp.exp(jnp.clip(pointmaps_raw[..., 6], -10.0, 10.0))
    return {"pts3d": pts3d, "pts3d_local": pts3d_local, "conf": conf}
