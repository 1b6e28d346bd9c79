"""Pallas TPU flash attention.

TPU-native replacement for the reference's CUDA attention stack (xFormers
`memory_efficient_attention`, /root/reference/train.py:139, and cuRoPE fused
rotary attention, README.md:67-71).  Online-softmax tiling: the (Nq, Nk)
logit matrix never touches HBM; k/v stream through VMEM in blocks while a
running (max, sum, acc) triple is carried in VMEM scratch.

Two masking modes (both needed by the model family):
- ``bias``: full additive bias (B, H, Nq, Nk) — the mask-transformer's
  per-head query→token mask (reference mask_transformer.py:272).
- ``kv_valid``: per-key validity (B, Nk) — the token-memory validity mask
  (fixed-capacity memory banks; reference's growing `mem_labels`,
  engine/must3r.py:76).

The backward pass recomputes attention with the jnp reference formula under
``jax.custom_vjp`` (correct, O(N) memory in HBM because XLA re-fuses it);
a dedicated backward kernel is a planned optimization.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from panst3r_tpu.ops.attention import dot_product_attention

_NEG_INF = float(jnp.finfo(jnp.float32).min)
_LOG2E = float(np.log2(np.e))
_LN2 = float(np.log(2.0))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rot2d(x, d: int):
    """rotate-half within each (y, x) half of the 2D-RoPE layout
    (ops/rope.py apply_rope_2d); feature dims beyond ``d`` (lane padding)
    come out zero — harmless since padded sin is zero anyway."""
    qd = d // 4
    rot = jnp.concatenate(
        [-x[..., qd:2 * qd], x[..., :qd],
         -x[..., 3 * qd:d], x[..., 2 * qd:3 * qd]], axis=-1)
    pad = x.shape[-1] - d
    if pad:
        rot = jnp.concatenate(
            [rot, jnp.zeros((*x.shape[:-1], pad), x.dtype)], axis=-1)
    return rot


# RoPE tables enter the kernel PRECOMPUTED as (B, N, D) f32 cos/sin rows
# (ops/rope.py rope2d_tables) rather than being generated in-kernel from
# position rows: the VPU transcendentals (exp/cos/sin over (block, D) per
# grid step) measured 3x the whole attention math at tower shapes
# (0.63 vs 0.20 ms/layer, PERFORMANCE.md round 2c).  Table HBM traffic is
# (block, D) f32 per grid step — two orders of magnitude below the score
# tile the kernel exists to avoid, and the un-broadcast (B, N, D) form
# stays per-batch (never per-head).


def _kernel(q_ref, k_ref, v_ref, bias_ref, kvalid_ref, kbias_ref,
            qcos_ref, qsin_ref, kcos_ref, ksin_ref, o_ref,
            m_scr, l_scr, acc_scr, q_scr, *, scale: float, nk_blocks: int,
            rope_d: int = 0, lse_ref=None):
    """Blocks carry G (batch·head) rows (leading axis) — at tower shapes
    (B·H ≥ 96, N ≤ 1k) a per-(b·h) grid is overhead-bound: 512 programs of
    ~2 µs each cost more than the matmuls (measured 0.90 ms/layer vs 0.25
    with G=2 full-N blocks on the 8-view ViT-L shape)."""
    ik = pl.program_id(2)
    rope = qcos_ref is not None

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        if rope:
            # Rotate q once per (group, q-block) and keep it in VMEM
            # scratch across all k steps (rotation in f32, stored in the
            # matmul dtype).  All G rows of a group share one table row
            # (G divides H, tables are per-batch): tables are (bq, d),
            # broadcast over the group axis.
            qf = q_ref[...].astype(jnp.float32)          # (G, bq, d)
            q_scr[...] = (qf * qcos_ref[...] + _rot2d(qf, rope_d)
                          * qsin_ref[...]).astype(q_scr.dtype)

    if rope:
        q = q_scr[...]                          # (G, bq, d) pre-rotated
        kf = k_ref[...].astype(jnp.float32)     # (G, bk, d)
        k = (kf * kcos_ref[...] + _rot2d(kf, rope_d) * ksin_ref[...]).astype(
            k_ref.dtype)
    else:
        q = q_ref[...]                          # (G, bq, d)
        k = k_ref[...]                          # (G, bk, d)
    # bf16 inputs, f32 accumulation — same contraction precision as the
    # XLA-native path (f32×f32 MXU rate is ~4x lower for no extra model
    # accuracy: inputs are bf16 upstream).
    #
    # Softmax runs in the exp2 domain: ``scale`` arrives pre-multiplied
    # by log2(e) (and biases pre-scaled, _flash_fwd), so the per-element
    # transcendental is the VPU-native exp2 with no log2e multiply pass.
    # The kernel is VPU-bound at the big cross-attention shapes (the
    # score tile sees ~7 elementwise passes vs 2 MXU ops), so every
    # removed pass is ~12% of kernel time.
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale

    if bias_ref is not None:
        s = s + bias_ref[...].astype(jnp.float32)
    if kvalid_ref is not None:
        valid = kvalid_ref[...] != 0             # (1, 1, bk) int mask
        s = jnp.where(valid, s, _NEG_INF)
    if kbias_ref is not None:
        s = s + kbias_ref[...]                   # (1, 1, bk) per-key bias

    m_prev = m_scr[:, :, :1]                     # (G, bq, 1)
    l_prev = l_scr[:, :, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)   # (G, bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    # Guard fully-masked rows: exp2(NEG_INF - NEG_INF) would be 2^0 = 1.
    safe_m = jnp.where(m_new <= _NEG_INF / 2, 0.0, m_new)
    # No post-masking needed on p/alpha: masked scores are ≤ f32-min (or
    # -inf after the log2e bias prescale), safe_m ≥ that, and
    # exp2(x ≤ -3e38) underflows to exactly 0.0 in f32 — the explicit
    # jnp.where passes this replaced cost a full score-tile pass each.
    p = jnp.exp2(s - safe_m)                     # (G, bq, bk)
    alpha = jnp.exp2(m_prev - safe_m)

    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[...] = acc

    @pl.when(ik == nk_blocks - 1)
    def _finalize():
        l = l_scr[:, :, :1]
        l = jnp.where(l == 0.0, 1.0, l)          # fully-masked rows → 0 out
        o_ref[...] = (acc_scr[...] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            # log-sum-exp per row (fully-masked rows → -inf sentinel).
            # m is in the exp2 domain (log2 units) — convert back so the
            # LSE contract stays NATURAL-log (the flash backward and any
            # external consumer expect ln Σ exp(s·scale)).
            m = m_scr[:, :, :1]
            lse = jnp.where(m <= _NEG_INF / 2, _NEG_INF,
                            m * _LN2 + jnp.log(l))
            lse_ref[...] = jnp.broadcast_to(lse, lse_ref.shape)


def fold_kv_valid(bias, kv_valid):
    """When both an additive bias and a (B, Nk) key-validity mask are given,
    fold the validity into the bias as a -inf additive term (the kernels
    plumb only one of the two); returns (bias, kv_valid) with at most one
    non-None."""
    if bias is None or kv_valid is None:
        return bias, kv_valid
    vb = jnp.where(kv_valid, 0.0, _NEG_INF).astype(jnp.float32)
    return bias + vb[:, None, None, :], None


def _flash_fwd(q, k, v, bias, kv_valid, scale, rope=None,
               block_q: int = 256, block_k: int = 512,
               with_lse: bool = False):
    """rope: optional (qcos, qsin, kcos, ksin) f32 tables of shape
    (B, Nq, D)/(B, Nk, D) from ops/rope.py rope2d_tables — 2D RoPE is
    applied to q/k inside the kernel (see pallas_mha_rope2d); the rotated
    tensors never touch HBM.  with_lse additionally returns the per-row
    log-sum-exp (needed by the flash backward)."""
    bias, kv_valid = fold_kv_valid(bias, kv_valid)
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    dtype = q.dtype

    # exp2-domain softmax (see _kernel): fold log2(e) into the score
    # scale and pre-scale additive biases to match.  -f32max biases
    # overflow to -inf under the multiply — exp2 still underflows to
    # exactly 0, which is the intent.
    scale = scale * _LOG2E
    if bias is not None:
        bias = bias.astype(jnp.float32) * _LOG2E

    kv_bias = None
    if bias is not None and bias.ndim == 4 and bias.shape[1] == 1 \
            and bias.shape[2] == 1:
        # Per-key bias (e.g. the decoder's ±inf memory-validity bias,
        # models/decoder.py memory_mask_bias): plumb as a (B, Nk) row
        # loaded (1, block_k) per grid step instead of materializing the
        # broadcast (B, H, Nq, Nk) f32 bias — which costs ~0.9 GB of HBM
        # traffic PER LAYER on the flagship render pass (PERFORMANCE.md
        # round 2 trace).
        kv_bias = jnp.broadcast_to(bias[:, 0, 0, :],
                                   (B, Nk)).astype(jnp.float32)
        bias = None

    def _pick_block(n: int, cap: int) -> int:
        # Smallest padded total wins (e.g. Nk=768: block 384 → 0 pad vs
        # the default 512 → 33% pad); ties prefer the larger block
        # (fewer grid steps).  Candidates stay (8,128)-tile aligned.
        # 128 excluded: the extra sequential grid steps cost more than
        # the padding they save (measured 2.8 → 5.0 ms on the DINO
        # shape).  Short sequences (≤ 1k) admit a single full block —
        # at the tower shapes a one-block grid measured ~1.8x faster
        # than 384-blocks (0.24 vs 0.43 ms/layer at G=4).
        cands = [c for c in (512, 384, 256) if c <= cap] or [cap]
        if n <= 1024:
            cands.append(_round_up(n, 128))
        return min(cands, key=lambda c: (_round_up(n, c), -c))

    block_q = _pick_block(Nq, min(block_q, _round_up(Nq, 128)))
    block_k = _pick_block(Nk, min(block_k, _round_up(Nk, 128)))
    # Head dim: a block last-dim equal to the array dim is always legal, so
    # D=64 (every tower here: 1024/16, 768/12) runs UNPADDED — the QK/AV
    # contractions drop to half MXU rate either way (64-lane contraction
    # padded to 128 computes zeros at "full" rate), but skipping the pad
    # halves q/k/v HBM traffic and removes the XLA pad/slice copies around
    # the kernel (measured: the padded kernel lost to XLA-native attention
    # at the ViT shape; the unpadded one wins — PERFORMANCE.md round 2c).
    Dp = D if D % 64 == 0 else _round_up(D, 128)
    Nqp = _round_up(Nq, block_q)
    Nkp = _round_up(Nk, block_k)

    needs_kv_mask = Nkp != Nk
    if needs_kv_mask and kv_valid is None and bias is None \
            and kv_bias is None:
        kv_valid = jnp.ones((B, Nk), jnp.bool_)

    def pad(x, axis, target):
        if x.shape[axis] == target:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, cfg)

    qf = pad(pad(q, 3, Dp), 2, Nqp).reshape(B * H, Nqp, Dp)
    kf = pad(pad(k, 3, Dp), 2, Nkp).reshape(B * H, Nkp, Dp)
    vf = pad(pad(v, 3, Dp), 2, Nkp).reshape(B * H, Nkp, Dp)

    nq_blocks = Nqp // block_q
    nk_blocks = Nkp // block_k

    bias_in = bias is not None
    kvalid_in = kv_valid is not None and bias is None
    kbias_in = kv_bias is not None
    rope_in = rope is not None

    # Group size G: each program carries G (batch·head) rows.  A per-row
    # grid is overhead-bound at tower shapes (B·H=128 × 2×2 blocks = 512
    # ~2 µs programs/layer ≈ 1 ms vs ~0.2 ms of matmul); G-row blocks
    # amortize it (measured 0.90 → 0.25 ms/layer at the 8-view ViT-L
    # shape with G=2 full-N blocks).  Constraints: G | B·H; per-batch
    # side inputs (kv masks / RoPE position rows, indexed b = g·G//H)
    # need G | H so a group never straddles a batch boundary; VMEM must
    # hold the (G, bq, bk) f32 score block plus pipelined in/out blocks.
    isz = jnp.dtype(dtype).itemsize
    per_batch_rows = kvalid_in or kbias_in or rope_in

    def _pick_group() -> int:
        for G in (8, 4, 2, 1):
            if (B * H) % G:
                continue
            if G > 1 and per_batch_rows and H % G:
                continue
            use = (G * block_q * block_k * 4                      # s/p f32
                   + 2 * G * block_q * 128 * 4                    # m, l
                   + G * block_q * Dp * 4                         # acc
                   + (G * block_q * Dp * 4 if rope_in else 0)     # q_scr
                   + 2 * G * (block_q + 2 * block_k) * Dp * isz   # in dbuf
                   + 2 * G * block_q * Dp * isz                   # out dbuf
                   + (2 * G * block_q * block_k * 4 if bias_in else 0)
                   + (4 * (block_q + block_k) * Dp * 4 if rope_in else 0)
                   + (2 * G * block_q * 128 * 4 if with_lse else 0))
            if use <= 9_500_000:
                return G
        return 1

    G = _pick_group()
    grid = (B * H // G, nq_blocks, nk_blocks)

    in_specs = [
        pl.BlockSpec((G, block_q, Dp), lambda g, i, j: (g, i, 0)),
        pl.BlockSpec((G, block_k, Dp), lambda g, i, j: (g, j, 0)),
        pl.BlockSpec((G, block_k, Dp), lambda g, i, j: (g, j, 0)),
    ]
    args = [qf, kf, vf]

    if bias_in:
        bias_full = jnp.broadcast_to(bias, (B, H, Nq, Nk)).astype(jnp.float32)
        bias_full = pad(pad(bias_full, 3, Nkp), 2, Nqp)
        if Nkp != Nk:
            neg = jnp.zeros((B, H, Nqp, Nkp), jnp.float32).at[..., Nk:].set(_NEG_INF)
            bias_full = bias_full + neg
        args.append(bias_full.reshape(B * H, Nqp, Nkp))
        in_specs.append(
            pl.BlockSpec((G, block_q, block_k), lambda g, i, j: (g, i, j)))

    def _batch_spec(block_n, axis):
        # (B, 1, N) side rows: all G rows of a group share one batch index
        # (G | H enforced above).
        def idx(g, i, j, G=G, H=H):
            return ((g * G) // H, 0, i if axis == "q" else j)
        return pl.BlockSpec((1, 1, block_n), idx)

    if kvalid_in:
        kvm = pad(kv_valid.astype(jnp.int32), 1, Nkp)[:, None, :]  # (B,1,Nkp)
        args.append(kvm)
        in_specs.append(_batch_spec(block_k, "k"))

    if kbias_in:
        kb = jnp.pad(kv_bias, ((0, 0), (0, Nkp - Nk)),
                     constant_values=_NEG_INF)[:, None, :]   # (B, 1, Nkp)
        args.append(kb)
        in_specs.append(_batch_spec(block_k, "k"))

    if rope_in:
        # (B, N, D) f32 cos/sin tables (per-batch — all G rows of a group
        # share one table block, G | H enforced above).  N-padded rows and
        # D-padded lanes use (cos=1, sin=0): identity rotation, so padded
        # (zero) q/k rows stay zero.
        def pad_tab(t, n, one):
            t = t.astype(jnp.float32)
            return jnp.pad(t, ((0, 0), (0, n - t.shape[1]),
                               (0, Dp - t.shape[2])),
                           constant_values=1.0 if one else 0.0)

        qcos, qsin, kcos, ksin = rope
        args += [pad_tab(qcos, Nqp, True), pad_tab(qsin, Nqp, False),
                 pad_tab(kcos, Nkp, True), pad_tab(ksin, Nkp, False)]

        def tab_spec(block_n, axis):
            def idx(g, i, j, G=G, H=H):
                return ((g * G) // H, i if axis == "q" else j, 0)
            return pl.BlockSpec((1, block_n, Dp), idx)

        in_specs += [tab_spec(block_q, "q"), tab_spec(block_q, "q"),
                     tab_spec(block_k, "k"), tab_spec(block_k, "k")]

    def kernel(*refs):
        idx = 3
        bias_ref = refs[idx] if bias_in else None
        idx += int(bias_in)
        kvalid_ref = refs[idx] if kvalid_in else None
        idx += int(kvalid_in)
        kbias_ref = refs[idx] if kbias_in else None
        idx += int(kbias_in)
        rope_refs = refs[idx:idx + 4] if rope_in else (None,) * 4
        idx += 4 * int(rope_in)
        o_ref = refs[idx]
        idx += 1
        lse_ref = refs[idx] if with_lse else None
        idx += int(with_lse)
        m_scr, l_scr, acc_scr = refs[idx:idx + 3]
        q_scr = refs[idx + 3] if rope_in else None
        _kernel(refs[0], refs[1], refs[2], bias_ref, kvalid_ref, kbias_ref,
                *rope_refs, o_ref, m_scr, l_scr, acc_scr, q_scr, scale=scale,
                nk_blocks=nk_blocks, rope_d=D if rope_in else 0,
                lse_ref=lse_ref)

    out_specs = [pl.BlockSpec((G, block_q, Dp), lambda g, i, j: (g, i, 0))]
    out_shapes = [jax.ShapeDtypeStruct((B * H, Nqp, Dp), dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((G, block_q, 128), lambda g, i, j: (g, i, 0)))
        out_shapes.append(
            jax.ShapeDtypeStruct((B * H, Nqp, 128), jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if with_lse else out_specs[0],
        out_shape=tuple(out_shapes) if with_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((G, block_q, 128), jnp.float32),
            pltpu.VMEM((G, block_q, 128), jnp.float32),
            pltpu.VMEM((G, block_q, Dp), jnp.float32),
        ] + ([pltpu.VMEM((G, block_q, Dp), dtype)] if rope_in else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * D,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
    )(*args)

    if with_lse:
        o, lse = out
        return (o.reshape(B, H, Nqp, Dp)[:, :, :Nq, :D],
                lse[:, :, 0].reshape(B, H, Nqp)[:, :, :Nq])
    return out.reshape(B, H, Nqp, Dp)[:, :, :Nq, :D]


def _use_flash_bwd() -> bool:
    """Kernel backward (flash_attention_bwd.py) vs XLA-recompute VJP.

    Opt-in (PANST3R_FLASH_BWD=1): at the default training sequence lengths
    (≤ a few k tokens) XLA's fused recompute measures faster (0.61 vs
    0.80 s/step on the flagship train step); the kernel backward is the
    O(N)-memory path for long-memory fine-tuning (decoder training against
    many-keyframe memories) where the (Nq, Nk) recompute no longer fits.
    """
    return os.environ.get("PANST3R_FLASH_BWD", "0") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _pallas_mha(q, k, v, bias, kv_valid, scale):
    return _flash_fwd(q, k, v, bias, kv_valid, scale)


def _mha_fwd(q, k, v, bias, kv_valid, scale):
    if _use_flash_bwd():
        out, lse = _flash_fwd(q, k, v, bias, kv_valid, scale, with_lse=True)
        return out, (q, k, v, bias, kv_valid, out, lse)
    out = _flash_fwd(q, k, v, bias, kv_valid, scale)
    return out, (q, k, v, bias, kv_valid, None, None)


def _mha_bwd(scale, res, g):
    q, k, v, bias, kv_valid, o, lse = res
    if lse is not None:
        # Flash backward kernels: p recomputed blockwise from (q, k, lse) —
        # no (Nq, Nk) materialization.  Bias is treated as
        # non-differentiable (both model uses are stop_gradient'd attention
        # masks / ±inf validity biases).
        from panst3r_tpu.ops.pallas.flash_attention_bwd import flash_bwd

        dq, dk, dv = flash_bwd(q, k, v, bias, kv_valid, None, o, lse, g,
                               scale)
        db = jnp.zeros_like(bias) if bias is not None else None
        return dq, dk, dv, db, None

    def ref(q, k, v, bias):
        mask = kv_valid[:, None, None, :] if kv_valid is not None else None
        return dot_product_attention(q, k, v, bias=bias, mask=mask, scale=scale)

    if bias is not None:
        _, vjp = jax.vjp(ref, q, k, v, bias)
        dq, dk, dv, db = vjp(g)
    else:
        _, vjp = jax.vjp(lambda q, k, v: ref(q, k, v, None), q, k, v)
        dq, dk, dv = vjp(g)
        db = None
    return dq, dk, dv, db, None


_pallas_mha.defvjp(_mha_fwd, _mha_bwd)


def _rope_tables(qy, qx, ky, kx, D, base):
    from panst3r_tpu.ops.rope import rope2d_tables

    qcos, qsin = rope2d_tables(jnp.stack([qy, qx], -1), D, base)
    kcos, ksin = rope2d_tables(jnp.stack([ky, kx], -1), D, base)
    return qcos, qsin, kcos, ksin


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _pallas_mha_rope(q, k, v, bias, kv_valid, qy, qx, ky, kx, scale, base):
    tabs = _rope_tables(qy, qx, ky, kx, q.shape[-1], base)
    return _flash_fwd(q, k, v, bias, kv_valid, scale, rope=tabs)


def _mha_rope_fwd(q, k, v, bias, kv_valid, qy, qx, ky, kx, scale, base):
    tabs = _rope_tables(qy, qx, ky, kx, q.shape[-1], base)
    if _use_flash_bwd():
        out, lse = _flash_fwd(q, k, v, bias, kv_valid, scale,
                              rope=tabs, with_lse=True)
        return out, (q, k, v, bias, kv_valid, qy, qx, ky, kx, out, lse)
    out = _flash_fwd(q, k, v, bias, kv_valid, scale, rope=tabs)
    return out, (q, k, v, bias, kv_valid, qy, qx, ky, kx, None, None)


def _mha_rope_bwd(scale, base, res, g):
    from panst3r_tpu.ops.rope import apply_rope_tables, rope2d_tables

    q, k, v, bias, kv_valid, qy, qx, ky, kx, o, lse = res
    qpos = jnp.stack([qy, qx], axis=-1)
    kpos = jnp.stack([ky, kx], axis=-1)
    D = q.shape[-1]
    qcos, qsin = rope2d_tables(qpos, D, base)
    kcos, ksin = rope2d_tables(kpos, D, base)
    pos_zeros = (jnp.zeros_like(qy), jnp.zeros_like(qx),
                 jnp.zeros_like(ky), jnp.zeros_like(kx))
    if lse is not None:
        from panst3r_tpu.ops.pallas.flash_attention_bwd import flash_bwd

        dq, dk, dv = flash_bwd(q, k, v, bias, kv_valid,
                               (qcos, qsin, kcos, ksin), o, lse, g, scale)
        db = jnp.zeros_like(bias) if bias is not None else None
        return (dq, dk, dv, db, None, *pos_zeros)

    def ref(q, k, v, bias):
        qr = apply_rope_tables(q, qcos, qsin)
        kr = apply_rope_tables(k, kcos, ksin)
        mask = kv_valid[:, None, None, :] if kv_valid is not None else None
        return dot_product_attention(qr, kr, v, bias=bias, mask=mask,
                                     scale=scale)

    if bias is not None:
        _, vjp = jax.vjp(ref, q, k, v, bias)
        dq, dk, dv, db = vjp(g)
    else:
        _, vjp = jax.vjp(lambda q, k, v: ref(q, k, v, None), q, k, v)
        dq, dk, dv = vjp(g)
        db = None
    return (dq, dk, dv, db, None, *pos_zeros)


_pallas_mha_rope.defvjp(_mha_rope_fwd, _mha_rope_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _pallas_mha_tabs(q, k, v, bias, kv_valid, qcos, qsin, kcos, ksin, scale):
    return _flash_fwd(q, k, v, bias, kv_valid, scale,
                      rope=(qcos, qsin, kcos, ksin))


def _mha_tabs_fwd(q, k, v, bias, kv_valid, qcos, qsin, kcos, ksin, scale):
    tabs = (qcos, qsin, kcos, ksin)
    if _use_flash_bwd():
        out, lse = _flash_fwd(q, k, v, bias, kv_valid, scale,
                              rope=tabs, with_lse=True)
        return out, (q, k, v, bias, kv_valid, *tabs, out, lse)
    out = _flash_fwd(q, k, v, bias, kv_valid, scale, rope=tabs)
    return out, (q, k, v, bias, kv_valid, *tabs, None, None)


def _mha_tabs_bwd(scale, res, g):
    from panst3r_tpu.ops.rope import apply_rope_tables

    q, k, v, bias, kv_valid, qcos, qsin, kcos, ksin, o, lse = res
    tab_zeros = (jnp.zeros_like(qcos), jnp.zeros_like(qsin),
                 jnp.zeros_like(kcos), jnp.zeros_like(ksin))
    if lse is not None:
        from panst3r_tpu.ops.pallas.flash_attention_bwd import flash_bwd

        dq, dk, dv = flash_bwd(q, k, v, bias, kv_valid,
                               (qcos, qsin, kcos, ksin), o, lse, g, scale)
        db = jnp.zeros_like(bias) if bias is not None else None
        return (dq, dk, dv, db, None, *tab_zeros)

    def ref(q, k, v, bias):
        qr = apply_rope_tables(q, qcos, qsin)
        kr = apply_rope_tables(k, kcos, ksin)
        mask = kv_valid[:, None, None, :] if kv_valid is not None else None
        return dot_product_attention(qr, kr, v, bias=bias, mask=mask,
                                     scale=scale)

    if bias is not None:
        _, vjp = jax.vjp(ref, q, k, v, bias)
        dq, dk, dv, db = vjp(g)
    else:
        _, vjp = jax.vjp(lambda q, k, v: ref(q, k, v, None), q, k, v)
        dq, dk, dv = vjp(g)
        db = None
    return (dq, dk, dv, db, None, *tab_zeros)


_pallas_mha_tabs.defvjp(_mha_tabs_fwd, _mha_tabs_bwd)


def pallas_mha_rope2d_tables(q, k, v, qcos, qsin, kcos, ksin, bias=None,
                             mask=None, scale=None):
    """Fused 2D-RoPE flash attention with caller-provided cos/sin tables
    (rope2d_tables).  Lets towers compute the tables ONCE per forward and
    reuse them across a scanned layer stack — XLA cannot hoist the table
    computation out of a `while` body, so the per-position form re-paid
    ~0.26 ms/layer of table math + pad fusions inside the 24-layer encoder
    scan (round-3 trace)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    kv_valid = None
    if mask is not None:
        if mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1:
            kv_valid = mask[:, 0, 0, :]
            mask = None
        else:
            mb = jnp.where(mask, 0.0, _NEG_INF).astype(jnp.float32)
            bias = mb if bias is None else bias + mb
            mask = None
    return _pallas_mha_tabs(q, k, v, bias, kv_valid, qcos, qsin, kcos, ksin,
                            scale)


def pallas_mha_rope2d(q, k, v, qpos, kpos, bias=None, mask=None, scale=None,
                      base: float = 100.0):
    """Fused 2D-RoPE + flash attention (the cuRoPE+xFormers replacement,
    BASELINE north-star kernel): q/k are rotated inside the kernel from
    PRECOMPUTED (B, N, D) f32 cos/sin tables (see the module-level note —
    in-kernel transcendentals measured 3x slower); the rotated q/k tensors
    never touch HBM.
    qpos: (B, Nq, 2); kpos: (B, Nk, 2)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # Positions ride as f32 rows (exact for patch-grid ints; float avoids
    # int cotangents in the custom_vjp).
    qy, qx = qpos[..., 0].astype(jnp.float32), qpos[..., 1].astype(jnp.float32)
    ky, kx = kpos[..., 0].astype(jnp.float32), kpos[..., 1].astype(jnp.float32)
    kv_valid = None
    if mask is not None:
        if mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1:
            kv_valid = mask[:, 0, 0, :]
            mask = None
        else:
            mb = jnp.where(mask, 0.0, _NEG_INF).astype(jnp.float32)
            bias = mb if bias is None else bias + mb
            mask = None
    return _pallas_mha_rope(q, k, v, bias, kv_valid, qy, qx, ky, kx,
                            scale, base)


def pallas_mha(q, k, v, bias=None, mask=None, scale=None):
    """Flash attention on TPU.  See ops/attention.py for conventions."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    kv_valid = None
    if mask is not None:
        if mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1:
            kv_valid = mask[:, 0, 0, :]
            mask = None
        else:
            mb = jnp.where(mask, 0.0, _NEG_INF).astype(jnp.float32)
            bias = mb if bias is None else bias + mb
            mask = None
    return _pallas_mha(q, k, v, bias, kv_valid, scale)
