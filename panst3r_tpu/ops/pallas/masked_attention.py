"""Block-sparse masked cross-attention (Pallas TPU, scalar-prefetch).

The mask transformer's masked cross-attention (reference
mask_transformer.py:170-198: queries attend only where their previous-layer
mask prediction is >= 0.5) has a per-query *blocked* pattern shared across
heads.  In late layers each query focuses on one object, so most
(query-block, kv-block) tiles are entirely blocked — dead work for a dense
kernel and dead HBM traffic for its bias.

This kernel skips dead KV blocks entirely:

- host-free preprocessing computes, per (batch, q-block), the list of LIVE
  kv-block indices (stable argsort of the dead map) and their count;
- the lists ride in as scalar-prefetch operands, and the K/V/mask
  BlockSpec index maps read them, so the grid's kv steps visit only live
  blocks; steps past the live count repeat the last live index — Pallas
  skips the DMA for a repeated block index, so dead blocks cost neither
  FLOPs (``pl.when``) nor bandwidth;
- the partial block interior applies the fine (bool) mask at VMEM speed —
  1 byte/element instead of the 4-byte f32 additive bias a dense kernel
  streams (and with no (B, H, Nq, Nk) head broadcast in HBM at all).

The backward runs the XLA recompute VJP (dense): at mask-transformer
shapes (Q=200) backward is a small fraction of the train step, and the
measured win of kernel backwards only appears at much longer sequences
(see PERFORMANCE.md crossover sweep).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(kv_idx_ref, count_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
            m_scr, l_scr, acc_scr, *, scale: float, nk_steps: int,
            num_heads: int):
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    j = pl.program_id(2)
    cnt = count_ref[bh // num_heads, iq]

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(j < cnt)
    def _compute():
        # Matmul in the input dtype (bf16) with f32 accumulation — an
        # f32×f32 contraction runs at ~1/4 the MXU rate for no model
        # accuracy (inputs are bf16 upstream).
        s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask_ref[0] != 0, _NEG_INF, s)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        safe_m = jnp.where(m_new <= _NEG_INF / 2, 0.0, m_new)
        p = jnp.exp(s - safe_m)
        p = jnp.where(s <= _NEG_INF / 2, 0.0, p)
        alpha = jnp.exp(m_prev - safe_m)
        alpha = jnp.where(m_prev <= _NEG_INF / 2, 0.0, alpha)

        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0],
            preferred_element_type=jnp.float32)

        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
        acc_scr[...] = acc

    @pl.when(j == nk_steps - 1)
    def _finalize():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)             # fully-masked rows → 0
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)


def plan_blocks(blocked: jnp.ndarray, block_q: int, block_k: int,
                nqp: int, nkp: int):
    """From the (B, Nq, Nk) True=blocked mask build the sparse visit plan.

    Returns (mask_i8 (B, Nqp, Nkp) int8 padded with 1s,
             kv_idx (B, nq, nk) int32 — live kv-block indices first
             (ascending), then the last live index repeated,
             count (B, nq) int32 — number of live kv blocks).
    """
    B, Nq, Nk = blocked.shape
    blk = jnp.pad(blocked, ((0, 0), (0, nqp - Nq), (0, nkp - Nk)),
                  constant_values=True)
    nq, nk = nqp // block_q, nkp // block_k
    dead = blk.reshape(B, nq, block_q, nk, block_k).all(axis=(2, 4))
    count = jnp.sum(~dead, axis=-1).astype(jnp.int32)          # (B, nq)
    # Stable argsort: live (False) blocks first, ascending index.
    kv_idx = jnp.argsort(dead, axis=-1, stable=True).astype(jnp.int32)
    last_live = jnp.take_along_axis(
        kv_idx, jnp.maximum(count - 1, 0)[..., None], axis=-1)
    steps = jnp.arange(nk, dtype=jnp.int32)
    kv_idx = jnp.where(steps[None, None] < count[..., None], kv_idx,
                       last_live)
    return blk.astype(jnp.int8), kv_idx, count


def _sparse_fwd(q, k, v, blocked, scale, block_q: int = 64,
                block_k: int = 256):
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    dtype = q.dtype

    block_q = min(block_q, _round_up(Nq, 8))
    block_k = min(block_k, _round_up(Nk, 128))
    Dp = _round_up(D, 128)
    Nqp = _round_up(Nq, block_q)
    Nkp = _round_up(Nk, block_k)

    def pad(x, axis, target):
        if x.shape[axis] == target:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, cfg)

    qf = pad(pad(q, 3, Dp), 2, Nqp).reshape(B * H, Nqp, Dp)
    kf = pad(pad(k, 3, Dp), 2, Nkp).reshape(B * H, Nkp, Dp)
    vf = pad(pad(v, 3, Dp), 2, Nkp).reshape(B * H, Nkp, Dp)

    mask_i8, kv_idx, count = plan_blocks(blocked, block_q, block_k, Nqp,
                                         Nkp)
    nq_blocks = Nqp // block_q
    nk_blocks = Nkp // block_k
    grid = (B * H, nq_blocks, nk_blocks)

    kernel = functools.partial(_kernel, scale=scale, nk_steps=nk_blocks,
                               num_heads=H)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp),
                         lambda b, i, j, kv_idx, cnt: (b, i, 0)),
            pl.BlockSpec((1, block_k, Dp),
                         lambda b, i, j, kv_idx, cnt, H=H:
                         (b, kv_idx[b // H, i, j], 0)),
            pl.BlockSpec((1, block_k, Dp),
                         lambda b, i, j, kv_idx, cnt, H=H:
                         (b, kv_idx[b // H, i, j], 0)),
            pl.BlockSpec((1, block_q, block_k),
                         lambda b, i, j, kv_idx, cnt, H=H:
                         (b // H, i, kv_idx[b // H, i, j])),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp),
                               lambda b, i, j, kv_idx, cnt: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, Dp), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Nqp, Dp), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kv_idx, count, qf, kf, vf, mask_i8)

    return out.reshape(B, H, Nqp, Dp)[:, :, :Nq, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sparse_mha(q, k, v, blocked, scale):
    return _sparse_fwd(q, k, v, blocked, scale)


def _sparse_mha_fwd(q, k, v, blocked, scale):
    return _sparse_fwd(q, k, v, blocked, scale), (q, k, v, blocked)


def _sparse_mha_bwd(scale, res, g):
    from panst3r_tpu.ops.attention import dot_product_attention

    q, k, v, blocked = res

    def ref(q, k, v):
        return dot_product_attention(q, k, v, mask=~blocked[:, None],
                                     scale=scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    dblocked = np.zeros(blocked.shape, jax.dtypes.float0)
    return dq, dk, dv, dblocked


_sparse_mha.defvjp(_sparse_mha_fwd, _sparse_mha_bwd)


def pallas_masked_mha(q, k, v, blocked, scale=None):
    """Block-sparse masked attention.  blocked: (B, Nq, Nk) bool, True =
    may NOT attend (torch attn_mask convention, shared across heads —
    reference mask_transformer.py:270-272).  Rows blocked everywhere
    return 0 (callers apply the all-blocked→unblock fixup upstream)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _sparse_mha(q, k, v, blocked, scale)
