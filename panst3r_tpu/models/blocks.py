"""Transformer block library (flax.linen).

TPU-native equivalents of the croco block library the reference imports
(`croco.models.blocks`: Block / CrossAttention / Mlp / DropPath —
/root/reference/src/panst3r/model/blocks.py:7, input_mixer.py:5) plus the
reference's own `CrossonlyDecoderBlock` (blocks.py:9-35) and the decoder
block with memory cross-attention needed by the MUSt3R-style decoder.

All attention goes through ops.attention.flash_attention (Pallas on TPU).
RoPE is applied functionally from integer (y, x) patch positions.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from panst3r_tpu.ops.attention import (flash_attention,
                                       flash_attention_rope2d,
                                       flash_attention_rope2d_tables)
from panst3r_tpu.ops.rope import apply_rope_2d


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    B, N, C = x.shape
    return x.reshape(B, N, num_heads, C // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, N, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * D)


def gelu_exact(x):
    """Exact (erf) GELU — torch ``nn.GELU()``'s default, used by croco's
    `Mlp` and HF ViTs.  flax's ``nn.gelu`` defaults to the tanh
    approximation, which would break layerwise weight-port parity
    (~1e-3/layer drift across a 24-block ViT) — f32/f64 (the port-parity
    and training-golden paths) always use the stock erf lowering.

    Half-precision (amp serving) uses the tanh form by default: its
    maximum deviation from exact GELU is 4.7e-4, ~16x BELOW bf16's own
    rounding of the exact output (7.8e-3 over the same range), so the
    swap is sub-noise in bf16 — and it is nearly free on the VPU where
    the exact forms are not (50-view tower MLP pair, r5 A/B: tanh
    +0.07 ms/layer, bit-exact polynomial fast_gelu +1.20, XLA erf
    +1.68; ~54 ms/scene across the two 24-layer towers).
    ``PANST3R_EXACT_GELU=1`` restores ops/gelu.py fast_gelu — still
    bit-identical to erf-GELU for every bf16 value at ~1/3 the cost of
    XLA's erf — for bit-exactness against torch bf16 inference."""
    if x.dtype in (jnp.bfloat16, jnp.float16):
        import os
        if os.environ.get("PANST3R_EXACT_GELU", "0") != "1":
            return jax.nn.gelu(x, approximate=True)
    from panst3r_tpu.ops.gelu import fast_gelu

    return fast_gelu(x)


class Mlp(nn.Module):
    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = gelu_exact

    @nn.compact
    def __call__(self, x):
        out = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, name="fc1")(x)
        x = self.act(x)
        # Materialize the activation: without this XLA folds the GELU
        # chain into the fc2 matmul's operand fusion and re-evaluates it
        # per K-tile — measured +0.21 ms/layer at the ViT-L MLP shape
        # (tools/ab_tower_block.py mlp vs mlp-barrier).
        x = jax.lax.optimization_barrier(x)
        x = nn.Dense(out, name="fc2")(x)
        return x


class SelfAttention(nn.Module):
    """Self-attention with optional fused 2D RoPE (cuRoPE equivalent)."""

    num_heads: int
    qkv_bias: bool = True
    rope_base: Optional[float] = 100.0

    @nn.compact
    def __call__(self, x, pos=None, mask=None, tabs=None):
        """tabs: optional precomputed RoPE (cos, sin) tables (B, N, D) —
        takes precedence over ``pos`` (lets a scanned tower hoist the
        table computation out of the layer loop)."""
        C = x.shape[-1]
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)

        # Tower fast path: the transpose-free fused-qkv kernel (d=64
        # heads, one k-block) skips the (B, N, C) -> (B·H, N, 64)
        # relayouts that cost as much as the attention math itself
        # (~0.25 ms/layer at the ViT-L shape, ab_attention_packed.py).
        from panst3r_tpu.ops.attention import _use_pallas
        from panst3r_tpu.ops.pallas.tower_attention import (
            supports_tower_attention, tower_self_attention)
        if mask is None and _use_pallas() \
                and supports_tower_attention(x.shape[1], C, self.num_heads):
            t = None
            if self.rope_base is not None:
                if tabs is not None:
                    t = tabs
                elif pos is not None:
                    from panst3r_tpu.ops.rope import rope2d_tables
                    t = rope2d_tables(pos, C // self.num_heads,
                                      self.rope_base)
            out = tower_self_attention(qkv, self.num_heads, tabs=t)
            return nn.Dense(C, name="proj")(out)

        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.num_heads) for t in (q, k, v))
        if tabs is not None and self.rope_base is not None:
            out = flash_attention_rope2d_tables(q, k, v, qtab=tabs,
                                                ktab=tabs, mask=mask)
        elif pos is not None and self.rope_base is not None:
            out = flash_attention_rope2d(q, k, v, qpos=pos, kpos=pos,
                                         mask=mask, base=self.rope_base)
        else:
            out = flash_attention(q, k, v, mask=mask)
        return nn.Dense(C, name="proj")(_merge_heads(out))


class CrossAttention(nn.Module):
    """Cross-attention; RoPE on q (query pos) and k (key pos) if given."""

    num_heads: int
    qkv_bias: bool = True
    rope_base: Optional[float] = 100.0

    @nn.compact
    def __call__(self, x, key, value, qpos=None, kpos=None,
                 bias=None, mask=None, qtab=None, ktab=None):
        C = x.shape[-1]
        q = nn.Dense(C, use_bias=self.qkv_bias, name="projq")(x)
        k = nn.Dense(C, use_bias=self.qkv_bias, name="projk")(key)
        v = nn.Dense(C, use_bias=self.qkv_bias, name="projv")(value)

        # Transpose-free cross path (see ops/pallas/tower_attention.py):
        # projected streams go to the kernel as lane-block head pairs; the
        # decoder's per-key memory-validity bias plumbs as a (B, Nk) row.
        from panst3r_tpu.ops.attention import _use_pallas
        from panst3r_tpu.ops.pallas.tower_attention import (
            supports_tower_cross, tower_cross_attention)
        per_key = (bias is not None and bias.ndim == 4
                   and bias.shape[1] == 1 and bias.shape[2] == 1)
        rope_ok = (self.rope_base is None
                   or (qtab is not None and ktab is not None)
                   or (qpos is not None and kpos is not None))
        if mask is None and (bias is None or per_key) and rope_ok \
                and _use_pallas() \
                and supports_tower_cross(x.shape[1], key.shape[1], C,
                                         self.num_heads):
            tabs_q = tabs_k = None
            if self.rope_base is not None:
                if qtab is not None:
                    tabs_q, tabs_k = qtab, ktab
                else:
                    from panst3r_tpu.ops.rope import rope2d_tables
                    D = C // self.num_heads
                    tabs_q = rope2d_tables(qpos, D, self.rope_base)
                    tabs_k = rope2d_tables(kpos, D, self.rope_base)
            kv_bias = (jnp.broadcast_to(bias[:, 0, 0, :],
                                        (k.shape[0], k.shape[1]))
                       if per_key else None)
            out = tower_cross_attention(q, k, v, qtab=tabs_q, ktab=tabs_k,
                                        kv_bias=kv_bias)
            return nn.Dense(C, name="proj")(out)

        q, k, v = (_split_heads(t, self.num_heads) for t in (q, k, v))
        if (self.rope_base is not None
                and (qtab is not None or ktab is not None)):
            out = flash_attention_rope2d_tables(q, k, v, qtab=qtab,
                                                ktab=ktab, bias=bias,
                                                mask=mask)
        elif (self.rope_base is not None and qpos is not None
                and kpos is not None):
            out = flash_attention_rope2d(q, k, v, qpos=qpos, kpos=kpos,
                                         bias=bias, mask=mask,
                                         base=self.rope_base)
        else:
            if self.rope_base is not None:
                if qpos is not None:
                    q = apply_rope_2d(q, qpos, self.rope_base)
                if kpos is not None:
                    k = apply_rope_2d(k, kpos, self.rope_base)
            out = flash_attention(q, k, v, bias=bias, mask=mask)
        return nn.Dense(C, name="proj")(_merge_heads(out))


class Block(nn.Module):
    """Pre-norm ViT block: x + attn(ln(x)); x + mlp(ln(x)).  croco `Block`."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    rope_base: Optional[float] = 100.0

    @nn.compact
    def __call__(self, x, pos=None, tabs=None):
        x = x + SelfAttention(self.num_heads, self.qkv_bias, self.rope_base,
                              name="attn")(nn.LayerNorm(name="norm1")(x),
                                           pos, tabs=tabs)
        x = x + Mlp(int(x.shape[-1] * self.mlp_ratio),
                    name="mlp")(nn.LayerNorm(name="norm2")(x))
        return x


class DecoderBlock(nn.Module):
    """Self-attn + memory cross-attn + MLP (pre-norm residual).

    The memory bank for this layer is the (normalized) key/value token set of
    all previously injected views (`memory_mode='norm_y'`, reference
    configs/base.yaml:15) — normalization is applied before banking, see
    models/decoder.py.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    rope_base: Optional[float] = 100.0

    @nn.compact
    def __call__(self, x, xpos, mem_y, mem_pos, mem_bias=None):
        """x: (B, N, C) current view tokens; mem_y: (B, M, C) pre-normalized
        memory tokens for this layer; mem_pos: (B, M, 2); mem_bias: additive
        attention bias (B, 1, 1, M) masking invalid memory slots."""
        x = x + SelfAttention(self.num_heads, self.qkv_bias, self.rope_base,
                              name="attn")(nn.LayerNorm(name="norm1")(x), xpos)
        x = x + CrossAttention(self.num_heads, self.qkv_bias, self.rope_base,
                               name="cross_attn")(
            nn.LayerNorm(name="norm2")(x), mem_y, mem_y,
            qpos=xpos, kpos=mem_pos, bias=mem_bias)
        x = x + Mlp(int(x.shape[-1] * self.mlp_ratio),
                    name="mlp")(nn.LayerNorm(name="norm3")(x))
        return x


class CrossonlyDecoderBlock(nn.Module):
    """Cross-attn + MLP residual block, no self-attn; norm on memory.

    Reference: src/panst3r/model/blocks.py:9-35 (used by the LoftUp
    upscaler).  Batch drop-path is a training-time stochastic skip; we keep
    the deterministic path (drop_path=0 in all reference configs).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    rope_base: Optional[float] = None

    @nn.compact
    def __call__(self, x, y, xpos=None, ypos=None):
        # torch-default LayerNorm eps (1e-5): the reference block uses plain
        # nn.LayerNorm (blocks.py:24-28), unlike croco blocks (1e-6).
        y_ = nn.LayerNorm(epsilon=1e-5, name="norm_y")(y)
        x = x + CrossAttention(self.num_heads, self.qkv_bias, self.rope_base,
                               name="cross_attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), y_, y_,
            qpos=xpos, kpos=ypos)
        x = x + Mlp(int(x.shape[-1] * self.mlp_ratio),
                    name="mlp")(nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        return x, y
