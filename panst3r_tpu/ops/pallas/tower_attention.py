"""Transpose-free self-attention kernel for the ViT towers.

The generic flash kernel (flash_attention.py) takes (B, H, N, D) operands,
so every tower layer pays a (B, N, C) → (B·H, N, 64) relayout for q/k/v and
back for the output — measured ~0.25 ms/layer at the encoder shape, as much
as the attention math itself (tools/ab_attention_packed.py, round 4: the
d=64 MXU lane cap is a theorem — packing two heads per 128-lane register
changes nothing for the matmuls — but the RELAYOUTS are real and avoidable).

This kernel consumes the fused qkv projection output (B, N, 3C) DIRECTLY:
each program owns one (batch, head-pair) and reads q/k/v as (N, 128)
lane-blocks of the same array (two d=64 heads side by side — dense HBM,
full vregs), computes both heads' softmax in VMEM (all tower shapes have
N ≤ 1024: one k-block, no online-softmax carry), and writes the output
straight back in (B, N, C) layout for the proj matmul.  Zero relayouts.

Options:
- ``tabs``: (cos, sin) 2D-RoPE tables (B, N, 64) (ops/rope.py), applied to
  q/k in VMEM (the cuRoPE replacement, reference README.md:67-71) — tiled
  to 128 lanes so one table block serves both heads of a pair.
- ``cls_kv``: (kc, vc) extra single-token key/value (B, 1, C) — the DINO
  cls token (reference dino.py:69).  Its score column joins the softmax
  analytically (exact; no 769→896 lane pad anywhere).  The cls QUERY row is
  computed by the caller in jnp (one (1, N+1) row).

Training: custom_vjp with a recompute backward through the reference
formula (the towers are frozen in the reference recipe; when fine-tuned,
XLA's fused recompute VJP was measured faster than kernel backwards at
these lengths — PERFORMANCE.md round 1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)
_LOG2E = float(np.log2(np.e))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rot2d_pair(x):
    """rotate-half of the 2D-RoPE layout for TWO d=64 heads packed in 128
    lanes (quarter size qd=16 per head; see ops/rope.py apply_rope_2d)."""
    parts = []
    for base in (0, 64):
        qd = 16
        parts += [-x[:, base + qd:base + 2 * qd], x[:, base:base + qd],
                  -x[:, base + 3 * qd:base + 4 * qd],
                  x[:, base + 2 * qd:base + 3 * qd]]
    return jnp.concatenate(parts, axis=-1)


def _kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, kc_ref, vc_ref, o_ref, *,
            scale: float, n_valid: int, rope: bool, cls: bool):
    q = q_ref[0]                                   # (bn, 128): two heads
    k = k_ref[0]
    v = v_ref[0]
    if rope:
        cos = cos_ref[0]                           # (bn, 128) f32
        sin = sin_ref[0]
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = (qf * cos + _rot2d_pair(qf) * sin).astype(q.dtype)
        k = (kf * cos + _rot2d_pair(kf) * sin).astype(k.dtype)

    bn = q.shape[0]
    pad = bn != n_valid
    if pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (bn, bn), 1)

    outs = []
    for h in (0, 1):
        sl = slice(64 * h, 64 * (h + 1))
        # scale arrives pre-multiplied by log2(e): exp2-domain softmax
        # (see flash_attention.py _kernel).
        s = jax.lax.dot_general(q[:, sl], k[:, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if pad:
            s = jnp.where(col < n_valid, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)     # (bn, 1)
        if cls:
            kc = kc_ref[0][:, sl]                  # (1, 64)
            vc = vc_ref[0][:, sl]
            # multiply-reduce instead of a (bn,64)·(1,64) dot_general —
            # Mosaic rejects the mixed-precision broadcast of the 1-row
            # operand (verified on hw; interpret mode accepts both).
            sc = jnp.sum(q[:, sl].astype(jnp.float32)
                         * kc.astype(jnp.float32), axis=-1,
                         keepdims=True) * scale    # (bn, 1)
            m = jnp.maximum(m, sc)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(v.dtype), v[:, sl],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if cls:
            pc = jnp.exp2(sc - m)                  # (bn, 1)
            l = l + pc
            acc = acc + pc * vc.astype(jnp.float32)
        outs.append(acc / l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _tower_fwd(qkv, tabs, cls_kv, scale):
    B, N, C3 = qkv.shape
    C = C3 // 3
    P = C // 128
    bn = _round_up(N, 128)
    rope = tabs is not None
    cls = cls_kv is not None

    if bn != N:
        qkv = jnp.pad(qkv, ((0, 0), (0, bn - N), (0, 0)))

    args = [qkv, qkv, qkv]
    in_specs = [
        pl.BlockSpec((1, bn, 128), lambda b, p: (b, 0, p)),
        pl.BlockSpec((1, bn, 128), lambda b, p, off=C // 128:
                     (b, 0, off + p)),
        pl.BlockSpec((1, bn, 128), lambda b, p, off=2 * C // 128:
                     (b, 0, off + p)),
    ]
    if rope:
        cos, sin = tabs                          # (B, N, 64) f32
        # one table block serves both heads of a pair (RoPE is per
        # position, shared across heads) — tile to the 128-lane block.
        def prep(t):
            t = jnp.tile(t.astype(jnp.float32), (1, 1, 2))
            if bn != N:
                t = jnp.pad(t, ((0, 0), (0, bn - N), (0, 0)))
            return t
        args += [prep(cos), prep(sin)]
        in_specs += [pl.BlockSpec((1, bn, 128), lambda b, p: (b, 0, 0))] * 2
    if cls:
        kc, vc = cls_kv                          # (B, 1, C)
        args += [kc, vc]
        in_specs += [pl.BlockSpec((1, 1, 128), lambda b, p: (b, 0, p))] * 2

    def kernel(*refs):
        idx = 3
        cos_ref = sin_ref = kc_ref = vc_ref = None
        if rope:
            cos_ref, sin_ref = refs[idx:idx + 2]
            idx += 2
        if cls:
            kc_ref, vc_ref = refs[idx:idx + 2]
            idx += 2
        _kernel(refs[0], refs[1], refs[2], cos_ref, sin_ref, kc_ref, vc_ref,
                refs[idx], scale=scale * _LOG2E, n_valid=N, rope=rope,
                cls=cls)

    out = pl.pallas_call(
        kernel,
        grid=(B, P),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bn, 128), lambda b, p: (b, 0, p)),
        out_shape=jax.ShapeDtypeStruct((B, bn, C), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * 2 * P * N * N * 64,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 2,
            transcendentals=B * 2 * P * N * N,
        ),
    )(*args)
    return out[:, :N] if bn != N else out


def _split_heads(t, C):
    B, N = t.shape[:2]
    return t.reshape(B, N, C // 64, 64).transpose(0, 2, 1, 3)


def _tower_ref(qkv, tabs, cls_kv, scale):
    """Reference semantics in jnp (CPU path / backward recompute)."""
    from panst3r_tpu.ops.attention import dot_product_attention
    from panst3r_tpu.ops.rope import apply_rope_tables

    C = qkv.shape[-1] // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(t, C) for t in (q, k, v))
    if tabs is not None:
        cos, sin = tabs
        q = apply_rope_tables(q, cos, sin)
        k = apply_rope_tables(k, cos, sin)
    if cls_kv is not None:
        kc, vc = cls_kv
        k = jnp.concatenate([_split_heads(kc, C), k], axis=2)
        v = jnp.concatenate([_split_heads(vc, C), v], axis=2)
    out = dot_product_attention(q, k, v, scale=scale)
    B, H, N, D = out.shape
    return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _tower_mha(qkv, tabs, cls_kv, scale):
    return _tower_fwd(qkv, tabs, cls_kv, scale)


def _tower_mha_fwd(qkv, tabs, cls_kv, scale):
    return _tower_fwd(qkv, tabs, cls_kv, scale), (qkv, tabs, cls_kv)


def _tower_mha_bwd(scale, res, g):
    qkv, tabs, cls_kv = res
    _, vjp = jax.vjp(lambda qkv, cls_kv: _tower_ref(qkv, tabs, cls_kv,
                                                    scale), qkv, cls_kv)
    dqkv, dcls = vjp(g)
    dtabs = jax.tree_util.tree_map(jnp.zeros_like, tabs)
    return dqkv, dtabs, dcls


_tower_mha.defvjp(_tower_mha_fwd, _tower_mha_bwd)


def supports_tower_attention(N: int, C: int, heads: int) -> bool:
    """Shape gate: N one k-block (≤ 1024), d=64 heads, pairable lanes."""
    return (N <= 1024 and C % 128 == 0 and heads * 64 == C
            and heads % 2 == 0)


def tower_self_attention(qkv, heads: int, tabs=None, cls_kv=None,
                         scale=None):
    """Fused-qkv self-attention for tower shapes (see module docstring).

    qkv: (B, N, 3C) projection output; tabs: optional (cos, sin) RoPE
    tables (B, N, 64); cls_kv: optional (kc, vc) (B, 1, C) extra key/value
    token joining every query's softmax.  Returns (B, N, C).
    """
    C = qkv.shape[-1] // 3
    if scale is None:
        scale = (C // heads) ** -0.5
    return _tower_mha(qkv, tabs, cls_kv, scale)
