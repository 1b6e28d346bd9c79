"""Attention entry points.

Replaces the reference's two CUDA attention paths — xFormers
`memory_efficient_attention` (toggled at /root/reference/train.py:139) and
torch `nn.MultiheadAttention` (mask_transformer.py:314,372) — with a single
API that dispatches between a pure-jnp reference implementation (CPU tests,
small shapes, arbitrary masks) and a Pallas flash-attention kernel on TPU.

Conventions: q (B, H, Nq, D), k/v (B, H, Nk, D); ``bias`` is additive in
logits (broadcastable to (B, H, Nq, Nk)); ``mask`` is boolean with True =
may attend (the *opposite* of torch's attn_mask — documented because the
reference's mask-transformer semantics at mask_transformer.py:270-272 are
"True = blocked"; callers here pre-invert).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _use_pallas() -> bool:
    if os.environ.get("PANST3R_DISABLE_PALLAS", "0") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: jnp.ndarray | None = None,
                          mask: jnp.ndarray | None = None,
                          scale: float | None = None) -> jnp.ndarray:
    """Scaled dot-product attention with fp32 softmax accumulation."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: jnp.ndarray | None = None,
                    mask: jnp.ndarray | None = None,
                    scale: float | None = None) -> jnp.ndarray:
    """Fused attention: Pallas kernel on TPU, jnp reference elsewhere.

    The Pallas path never materializes the (Nq, Nk) logits in HBM — this is
    the TPU equivalent of the cuRoPE+xFormers fused path in the reference.

    Exception: tiny shapes (Nq < 256 — e.g. the mask transformer's
    200-query self-attention) run the XLA-native path, where the
    materialized logits are cheap and kernel grid overhead is not.  The
    tower shapes (Nq = Nk = 768, D = 64) go to the kernel: with grouped
    (batch·head) blocks and an unpadded head dim it measures 0.25 ms/layer
    vs 0.65 for XLA-native, which streams ~300 MB of f32 logits through
    HBM per ViT-L layer (PERFORMANCE.md round 2c).
    """
    if q.shape[2] < 256 and k.shape[2] <= 1024 and bias is None \
            and mask is None:
        return dot_product_attention(q, k, v, scale=scale)
    if _use_pallas():
        from panst3r_tpu.ops.pallas.flash_attention import pallas_mha
        try:
            return pallas_mha(q, k, v, bias=bias, mask=mask, scale=scale)
        except NotImplementedError:
            pass
    return dot_product_attention(q, k, v, bias=bias, mask=mask, scale=scale)


def flash_attention_rope2d_tables(q, k, v, qtab=None, ktab=None, bias=None,
                                  mask=None, scale=None):
    """Attention with 2D RoPE applied from PRECOMPUTED (cos, sin) tables
    ((B, N, D) pairs from ops/rope.py rope2d_tables).  The table form lets
    a scanned tower compute tables once per forward instead of once per
    layer (positions are loop-invariant, but XLA cannot hoist out of a
    `while` body).  Either side's tables may be None (no rotation)."""
    from panst3r_tpu.ops.rope import apply_rope_tables

    tiny = q.shape[2] < 256 and k.shape[2] <= 1024 and bias is None \
        and mask is None
    if not tiny and _use_pallas() and qtab is not None and ktab is not None:
        from panst3r_tpu.ops.pallas.flash_attention import (
            pallas_mha_rope2d_tables)
        try:
            return pallas_mha_rope2d_tables(q, k, v, qtab[0], qtab[1],
                                            ktab[0], ktab[1], bias=bias,
                                            mask=mask, scale=scale)
        except NotImplementedError:
            pass
    if qtab is not None:
        q = apply_rope_tables(q, *qtab)
    if ktab is not None:
        k = apply_rope_tables(k, *ktab)
    if tiny:
        return dot_product_attention(q, k, v, scale=scale)
    return flash_attention(q, k, v, bias=bias, mask=mask, scale=scale)


def flash_attention_rope2d(q, k, v, qpos=None, kpos=None, bias=None,
                           mask=None, scale=None, base: float = 100.0):
    """Attention with 2D RoPE applied to q (by qpos) and k (by kpos).

    TPU: fused Pallas kernel (rotation in VMEM — the cuRoPE replacement).
    Elsewhere: jnp rotation + reference attention.  Positions may be None
    on either side (e.g. memory keys already carry positions, queries not).

    Exception (same as flash_attention): tiny Nq runs jnp RoPE + the
    XLA-native path.  The ViT-L encoder's 8-view (8, 16, 768, 64) shape
    goes to the fused kernel: grouped (batch·head) blocks + unpadded head
    dim measure 0.25 ms/layer vs 0.63 for jnp-RoPE + XLA-native
    (PERFORMANCE.md round 2c; round 2's opposite routing predates the
    grouped blocks).
    """
    if q.shape[2] < 256 and k.shape[2] <= 1024 and bias is None \
            and mask is None:
        from panst3r_tpu.ops.rope import apply_rope_2d

        if qpos is not None:
            q = apply_rope_2d(q, qpos, base)
        if kpos is not None:
            k = apply_rope_2d(k, kpos, base)
        return dot_product_attention(q, k, v, scale=scale)
    if _use_pallas() and qpos is not None and kpos is not None:
        from panst3r_tpu.ops.pallas.flash_attention import pallas_mha_rope2d
        try:
            return pallas_mha_rope2d(q, k, v, qpos, kpos, bias=bias,
                                     mask=mask, scale=scale, base=base)
        except NotImplementedError:
            pass
    from panst3r_tpu.ops.rope import apply_rope_2d

    if qpos is not None:
        q = apply_rope_2d(q, qpos, base)
    if kpos is not None:
        k = apply_rope_2d(k, kpos, base)
    return flash_attention(q, k, v, bias=bias, mask=mask, scale=scale)


def _split_cls_ref(q, k, v, qc, kc, vc, scale):
    """Reference semantics: plain attention over [cls; patches]."""
    qa = jnp.concatenate([qc, q], axis=2)
    ka = jnp.concatenate([kc, k], axis=2)
    va = jnp.concatenate([vc, v], axis=2)
    out = dot_product_attention(qa, ka, va, scale=scale)
    return out[:, :, 1:], out[:, :, :1]


def _split_cls_fixup(q, k, v, qc, kc, vc, scale):
    # Dense-N kernel pass over the patches + exact rank-1 online-softmax
    # fixup for the cls key.  softmax([s_c | S]) == combine(LSE(S), s_c):
    # the flash kernel's per-row log-sum-exp makes the cls column a
    # two-term logsumexp merge — no 769-token (lane-padded-to-896) arrays
    # anywhere.
    from panst3r_tpu.ops.pallas.flash_attention import _flash_fwd

    out_p, lse = _flash_fwd(q, k, v, None, None, scale, with_lse=True)
    s_c = jnp.einsum("bhnd,bhkd->bhnk", q, kc,
                     preferred_element_type=jnp.float32) * scale  # (B,H,N,1)
    lse = lse[..., None]                                          # (B,H,N,1)
    m = jnp.maximum(lse, s_c)
    wp = jnp.exp(lse - m)
    wc = jnp.exp(s_c - m)
    num = wp * out_p.astype(jnp.float32) + wc * vc.astype(jnp.float32)
    out = (num / (wp + wc)).astype(out_p.dtype)

    # cls query row: one (1, N+1) score row — tiny, plain jnp.
    s_row = jnp.concatenate([
        jnp.einsum("bhqd,bhkd->bhqk", qc, kc,
                   preferred_element_type=jnp.float32),
        jnp.einsum("bhqd,bhkd->bhqk", qc, k,
                   preferred_element_type=jnp.float32)], axis=-1) * scale
    p_row = jax.nn.softmax(s_row, axis=-1)
    out_c = (p_row[..., :1] * vc.astype(jnp.float32)
             + jnp.einsum("bhqk,bhkd->bhqd", p_row[..., 1:],
                          v.astype(jnp.float32))).astype(out_p.dtype)
    return out, out_c


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _split_cls_attention(q, k, v, qc, kc, vc, scale):
    if not _use_pallas():
        return _split_cls_ref(q, k, v, qc, kc, vc, scale)
    return _split_cls_fixup(q, k, v, qc, kc, vc, scale)


def _split_cls_fwd(q, k, v, qc, kc, vc, scale):
    return _split_cls_attention(q, k, v, qc, kc, vc, scale), \
        (q, k, v, qc, kc, vc)


def _split_cls_bwd(scale, res, g):
    _, vjp = jax.vjp(lambda *a: _split_cls_ref(*a, scale), *res)
    return vjp(g)


_split_cls_attention.defvjp(_split_cls_fwd, _split_cls_bwd)


def flash_attention_split_cls(q, k, v, qc, kc, vc, scale=None):
    """Self-attention over [cls; patches] with the cls token carried
    SEPARATELY: q/k/v are (B, H, N, D) patch streams, qc/kc/vc (B, H, 1, D)
    the cls stream.  Exactly softmax over all N+1 keys for every query
    (same math as concatenating), but the N-wide kernel pass stays at the
    dense patch count — a DINO grid of 768 patches + cls otherwise pads
    769 → 896 lanes inside attention (+36% QK/AV work and a synthesized
    validity-mask pass, xplane round 4).  Returns (out_patches, out_cls).
    Reference cls semantics: /root/reference/src/panst3r/model/dino.py:69.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _split_cls_attention(q, k, v, qc, kc, vc, scale)


def masked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     blocked: jnp.ndarray,
                     scale: float | None = None) -> jnp.ndarray:
    """Masked cross-attention with a per-query boolean block mask.

    blocked: (B, Nq, Nk) bool, True = may NOT attend (torch attn_mask
    convention, shared across heads — the mask transformer's masked
    cross-attention, reference mask_transformer.py:270-272).

    TPU: block-sparse Pallas kernel that *skips* fully-blocked KV tiles
    (no FLOPs, no DMA) — in late decoder layers most tiles are dead, so
    this is much cheaper than dense attention with an additive bias.
    Elsewhere: dense reference attention.  Rows blocked everywhere return
    0; callers apply the all-blocked→unblock fixup upstream.
    """
    if (_use_pallas()
            and os.environ.get("PANST3R_DISABLE_SPARSE_MASK", "0") != "1"):
        from panst3r_tpu.ops.pallas.masked_attention import pallas_masked_mha
        try:
            return pallas_masked_mha(q, k, v, blocked, scale=scale)
        except NotImplementedError:
            pass
    return dot_product_attention(q, k, v, mask=~blocked[:, None],
                                 scale=scale)


def memory_mask_bias(valid: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Additive bias blocking invalid memory slots.

    valid: (B, Nk) bool → (B, 1, 1, Nk) bias with -inf at invalid slots.
    Used by the token-memory cross-attention (fixed-capacity memory banks,
    see models/memory.py) — the validity mask plays the role of the
    reference's dynamically-growing `mem_labels`
    (/root/reference/src/panst3r/engine/must3r.py:76,107).
    """
    return jnp.where(valid, 0.0, _NEG_INF).astype(dtype)[:, None, None, :]
