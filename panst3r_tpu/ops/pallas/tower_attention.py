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
# int8-KV engages only at render-scale query counts (see _cross_fwd);
# tests monkeypatch this to exercise the path at small shapes.
_INT8_MIN_NQ = 16384


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

    # Both heads' score matmuls issue BEFORE either softmax chain, so
    # head 1's MXU contraction overlaps head 0's VPU chain (the same
    # restructure as _cross_kernel).
    ss = []
    for h in (0, 1):
        sl = slice(64 * h, 64 * (h + 1))
        # scale arrives pre-multiplied by log2(e): exp2-domain softmax
        # (see flash_attention.py _kernel).
        s = jax.lax.dot_general(q[:, sl], k[:, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if pad:
            s = jnp.where(col < n_valid, s, _NEG_INF)
        ss.append(s)
    outs = []
    for h in (0, 1):
        sl = slice(64 * h, 64 * (h + 1))
        s = ss[h]
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
        # Row-sum rides the p·v contraction: [v_h | 1] fills the 128-lane
        # MXU tile the 64-lane output pads to anyway, so acc lanes 64+
        # hold l at identical MXU cost (see _cross_kernel; the separate
        # (bn, bn) f32 sum pass is gone from the VPU chain).
        p = jnp.exp2(s - m).astype(v.dtype)
        vh = jnp.concatenate(
            [v[:, sl], jnp.ones((v.shape[0], 64), v.dtype)], axis=-1)
        acc = jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if cls:
            pc = jnp.exp2(sc - m)                  # (bn, 1)
            acc = acc + pc * jnp.concatenate(
                [vc, jnp.ones((1, 64), vc.dtype)],
                axis=-1).astype(jnp.float32)
        outs.append(acc[:, :64] / acc[:, 64:65])
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


def _cross_kernel(q_ref, k_ref, v_ref, qcos_ref, qsin_ref, kcos_ref,
                  ksin_ref, kb_ref, o_ref,
                  q_scr, c_scr, m0, a0, m1, a1, *,
                  scale: float, nk_blocks: int, rope: bool, kbias: bool,
                  sub_k: int = 1, bk_in: int = 0, int8: bool = False):
    """Blocked cross-attention over the token memory: lane-block head
    pairs (transpose-free), online softmax across k blocks, optional
    per-key additive bias (memory validity) and RoPE tables.

    r5 VPU-chain cuts (the kernel ran at ~70% of the d=64 lane bound;
    the gap was elementwise passes serialized against the MXU):
    - the softmax scale is folded into the q stream once at init (rope:
      pre-scaled q tables from the host; else one f32 multiply on the
      (bq, 128) block) — no per-block (bq, bk) scale pass;
    - all score matmuls of a block issue before any softmax chain, so
      later MXU contractions overlap earlier VPU chains;
    - the softmax row-sum rides the p·v contraction: v's 64 head lanes
      are extended with ones to the 128-lane MXU tile the contraction
      pads to anyway, so acc lanes 64+ accumulate l with the same alpha
      rescale as the numerator — the separate (bq, bk) f32 sum pass and
      the l-scratch update are gone from the chain (the MXU cost of a
      64- vs 128-lane output tile is identical);
    - p is cast to the v dtype (bf16 in serving) right at the exp2, so
      numerator AND denominator use the same rounded p (the old chain
      already fed bf16 p to the numerator but summed f32 p into l);
    - ``sub_k`` > 1 splits the fetched k block into sub-blocks whose
      softmax chains run back-to-back against the pre-issued matmuls —
      more overlap windows per DMA (the "two-stage k-tiling" lever);
    - ``int8`` (opt-in serving precision, PANST3R_KV_INT8=1): k arrives
      PRE-ROTATED and per-tensor-quantized to int8 (σk folded into the
      pre-scaled q tables by the caller); the rotated scaled q is
      per-row-quantized here at init (q8 + a (bq, 1) scale carry), the
      score matmul runs int8×int8→int32 on the MXU (measured 1.92× the
      bf16 d=64 throughput on v5e), and the row scale folds into the
      exp2 pass via the softmax stabilizer — any m ≥ rowmax is a valid
      stabilizer, so m tracks c·rowmax(S_raw) even under the additive
      validity bias (which only lowers masked columns)."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        for m, a in ((m0, a0), (m1, a1)):
            m[...] = jnp.full_like(m, _NEG_INF)
            a[...] = jnp.zeros_like(a)
        if int8:
            # q tables carry scale·log2e·σk: the quantized product
            # c_row·(q8·k8) reproduces the scaled rotated scores.
            qf = q_ref[0].astype(jnp.float32)
            qrot = qf * qcos_ref[0] + _rot2d_pair(qf) * qsin_ref[0]
            amax = jnp.maximum(jnp.max(jnp.abs(qrot), axis=-1,
                                       keepdims=True), 1e-20)
            q_scr[...] = jnp.round(qrot * (127.0 / amax)).astype(jnp.int8)
            c_scr[...] = jnp.broadcast_to(amax * (1.0 / 127.0),
                                          c_scr.shape)
        elif rope:
            # q tables arrive pre-multiplied by scale·log2(e) (host prep)
            # so the scaled, rotated q costs nothing extra here.
            qf = q_ref[0].astype(jnp.float32)
            q_scr[...] = (qf * qcos_ref[0] + _rot2d_pair(qf)
                          * qsin_ref[0]).astype(q_scr.dtype)
        else:
            q_scr[...] = (q_ref[0].astype(jnp.float32)
                          * scale).astype(q_scr.dtype)

    def _block_body(add_bias):
        q = q_scr[...]                             # (bq, 128)
        k = k_ref[0]                               # (sub_k·bk_in, 128)
        v = v_ref[0]
        if rope and not int8:                      # int8 k is pre-rotated
            kf = k.astype(jnp.float32)
            k = (kf * kcos_ref[0] + _rot2d_pair(kf)
                 * ksin_ref[0]).astype(k.dtype)

        heads = ((m0, a0), (m1, a1))
        nsub = max(sub_k, 1)
        bki = bk_in if bk_in else k.shape[0]
        # Every (sub, head) score matmul issues BEFORE any softmax chain
        # — later MXU contractions overlap earlier VPU chains (the main
        # r5 restructure).  Each chain then completes (exp2 → l → AV
        # matmul) before the next starts, so only the score tiles plus
        # one p tile are live; the raised vmem_limit_bytes covers the
        # 2·sub_k score tiles.
        s = []
        for sub in range(nsub):
            row = slice(sub * bki, (sub + 1) * bki)
            for h in (0, 1):
                sl = slice(64 * h, 64 * (h + 1))
                if int8:
                    # raw int32 scores; scale/bias fold into the exp2
                    # pass below (c_row > 0 keeps max tracking monotone)
                    sh = jax.lax.dot_general(
                        q[:, sl], k[row, sl], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:
                    sh = jax.lax.dot_general(
                        q[:, sl], k[row, sl], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if add_bias:
                        sh = sh + kb_ref[0][:, row]  # (1, bki), pre-scaled
                s.append(sh)
        for sub in range(nsub):
            row = slice(sub * bki, (sub + 1) * bki)
            for h, (m_scr, acc_scr) in enumerate(heads):
                sh = s[sub * 2 + h]
                m_prev = m_scr[:, :1]
                if int8:
                    c = c_scr[:, :1]
                    m_new = jnp.maximum(
                        m_prev, jnp.max(sh, axis=-1,
                                        keepdims=True).astype(jnp.float32)
                        * c)
                    safe_m = jnp.where(m_new <= _NEG_INF / 2, 0.0, m_new)
                    sf = sh.astype(jnp.float32) * c
                    if add_bias:
                        sf = sf + kb_ref[0][:, row]
                    p = jnp.exp2(sf - safe_m).astype(v.dtype)
                else:
                    m_new = jnp.maximum(m_prev,
                                        jnp.max(sh, axis=-1, keepdims=True))
                    # Fully-masked-so-far guard (flash_attention.py).
                    safe_m = jnp.where(m_new <= _NEG_INF / 2, 0.0, m_new)
                    p = jnp.exp2(sh - safe_m).astype(v.dtype)
                alpha = jnp.exp2(m_prev - safe_m)
                m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
                sl = slice(64 * h, 64 * (h + 1))
                # [v_h | 1]: acc lanes :64 accumulate the weighted
                # values, lanes 64+ the row-sum l — one contraction.
                vh = jnp.concatenate(
                    [v[row, sl],
                     jnp.ones((v[row].shape[0], 64), v.dtype)], axis=-1)
                acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
                    p, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    if kbias:
        # Validity-aware tile skip: a key block whose bias row is all
        # -inf (ring-buffer slots beyond the occupied prefix; padded
        # keys) contributes exactly nothing to the online softmax — skip
        # its matmuls/exp entirely (SLAM's fixed-capacity memory runs
        # mostly-empty early in a session; reference's growing
        # mem_labels, engine/must3r.py:76).
        @pl.when(jnp.max(kb_ref[0]) > _NEG_INF / 2)
        def _valid_block():
            _block_body(True)
    else:
        _block_body(False)

    @pl.when(ik == nk_blocks - 1)
    def _fin():
        outs = []
        for m_scr, acc_scr in ((m0, a0), (m1, a1)):
            acc = acc_scr[...]
            l = acc[:, 64:65]                      # the ones-column sum
            l = jnp.where(l == 0.0, 1.0, l)        # fully-masked rows → 0
            outs.append(acc[:, :64] / l)
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _rot2d_pair_nd(x):
    """_rot2d_pair over a trailing 128-lane axis of any rank."""
    parts = []
    for base in (0, 64):
        qd = 16
        parts += [-x[..., base + qd:base + 2 * qd],
                  x[..., base:base + qd],
                  -x[..., base + 3 * qd:base + 4 * qd],
                  x[..., base + 2 * qd:base + 3 * qd]]
    return jnp.concatenate(parts, axis=-1)


def _cross_fwd(q, k, v, qtab, ktab, kv_bias, scale,
               block_q: int = 1536, block_k: int = 1536,
               sub_k: int = 1, kv_int8: bool = False):
    """Block defaults measured on chip (tools/ab_cross_blocks.py, r5
    sweep with the raised in-kernel VMEM limit): at the 50-view render
    shape (38400 q × 12288 kv) bq=1536/bk=1536 runs 19.76 ms/call vs
    22.9 at the old r4 (1024, 1536) default — the per-grid-step exposed
    VPU time shrinks with block area, and 38400 = 25×1536 tiles exactly.
    Serve shape (6144 q × 3072 kv) is within noise of the r4 optimum
    (0.82-0.83 vs 0.79-0.85 across passes).  bq beyond 1536 pads 38400
    and loses; bk=3072 loses the carry-count gain to bigger live tiles."""
    B, Nq, C = q.shape
    Nk = k.shape[1]
    P = C // 128
    rope = qtab is not None

    def pick(n, cands):
        cands = [c for c in cands if True]
        if n <= 1024:
            cands = cands + [_round_up(n, 128)]
        return min(cands, key=lambda c: (_round_up(n, c), -c))

    # Fallbacks (ADVICE r4): mid-size Nq that are 512- but not
    # 1536-multiples (e.g. 2048, 2304) tile exactly at a smaller block
    # instead of padding up to the next 1536 boundary; the tuned 1536
    # wins at the 6144/38400-q render shapes where it divides.
    bq = pick(Nq, [block_q, 1024, 512])
    bk = pick(Nk, [block_k, 1024, 768, 512])
    # sub_k > 1: fetch sub_k k-blocks per grid step and run their softmax
    # chains back-to-back against pre-issued score matmuls (more MXU/VPU
    # overlap windows per DMA).  Only engaged when it does not add
    # padding; the fetched outer block is sub_k*bk wide.
    if sub_k > 1 and _round_up(Nk, bk * sub_k) != _round_up(Nk, bk):
        sub_k = 1
    bko = bk * max(sub_k, 1)
    Nqp, Nkp = _round_up(Nq, bq), _round_up(Nk, bko)

    kbias = kv_bias is not None or Nkp != Nk
    if kbias:
        kb = (jnp.zeros((B, Nk), jnp.float32) if kv_bias is None
              else kv_bias.astype(jnp.float32) * _LOG2E)
        kb = jnp.pad(kb, ((0, 0), (0, Nkp - Nk)),
                     constant_values=_NEG_INF)[:, None, :]   # (B, 1, Nkp)

    if Nqp != Nq:
        q = jnp.pad(q, ((0, 0), (0, Nqp - Nq), (0, 0)))
    if Nkp != Nk:
        k = jnp.pad(k, ((0, 0), (0, Nkp - Nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Nkp - Nk), (0, 0)))

    args = [q, k, v]
    in_specs = [
        pl.BlockSpec((1, bq, 128), lambda g, i, j, P=P: (g // P, i, g % P)),
        pl.BlockSpec((1, bko, 128), lambda g, i, j, P=P: (g // P, j, g % P)),
        pl.BlockSpec((1, bko, 128), lambda g, i, j, P=P: (g // P, j, g % P)),
    ]
    # int8 needs the table prep, and only pays where the per-call k
    # rotate+quantize (∝ Nk·C) amortizes over the score work (∝ Nq·Nk):
    # measured in-program, the 50-view render call (38400 q) nets
    # −2.2 ms/layer while the membuild decoders (≤3072 q) nearly DOUBLE
    # (prep dwarfs their kernels) — gate on Nq.
    kv_int8 = kv_int8 and rope and Nq >= _INT8_MIN_NQ
    if rope:
        def prep(t, n, mul=1.0):
            t = jnp.tile(t.astype(jnp.float32) * mul, (1, 1, 2))
            if t.shape[1] != n:
                t = jnp.pad(t, ((0, 0), (0, n - t.shape[1]), (0, 0)))
            return t
        # q tables carry the softmax scale (×log2 e for the exp2-domain
        # softmax): the scaled rotated q is built once in the kernel's
        # init step and no per-(bq, bk) scale pass exists at all.
        sa = scale * _LOG2E
        if kv_int8:
            # Pre-rotate k across all lane pairs with the shared pair
            # table and quantize per-tensor to int8 (dynamic amax —
            # computed once per call, amortized over Nqp/bq q-tiles);
            # σk folds into the pre-scaled q tables so the kernel's
            # per-row quantization scale carries the whole product.
            kcos = prep(ktab[0], Nkp)[:, :, None]       # (B, Nkp, 1, 128)
            ksin = prep(ktab[1], Nkp)[:, :, None]
            kf = k.astype(jnp.float32).reshape(B, Nkp, P, 128)
            kr = kf * kcos + _rot2d_pair_nd(kf) * ksin
            sig_k = jnp.maximum(jnp.max(jnp.abs(kr)), 1e-20) / 127.0
            args[1] = jnp.round(kr / sig_k).astype(jnp.int8) \
                .reshape(B, Nkp, C)
            args += [prep(qtab[0], Nqp, sa * sig_k),
                     prep(qtab[1], Nqp, sa * sig_k)]
            in_specs += [
                pl.BlockSpec((1, bq, 128),
                             lambda g, i, j, P=P: (g // P, i, 0)),
                pl.BlockSpec((1, bq, 128),
                             lambda g, i, j, P=P: (g // P, i, 0)),
            ]
        else:
            args += [prep(qtab[0], Nqp, sa), prep(qtab[1], Nqp, sa),
                     prep(ktab[0], Nkp), prep(ktab[1], Nkp)]
            in_specs += [
                pl.BlockSpec((1, bq, 128),
                             lambda g, i, j, P=P: (g // P, i, 0)),
                pl.BlockSpec((1, bq, 128),
                             lambda g, i, j, P=P: (g // P, i, 0)),
                pl.BlockSpec((1, bko, 128),
                             lambda g, i, j, P=P: (g // P, j, 0)),
                pl.BlockSpec((1, bko, 128),
                             lambda g, i, j, P=P: (g // P, j, 0)),
            ]
    if kbias:
        args.append(kb)
        in_specs.append(
            pl.BlockSpec((1, 1, bko), lambda g, i, j, P=P: (g // P, 0, j)))

    nk_blocks = Nkp // bko

    def kernel(*refs):
        idx = 3
        qcos = qsin = kcos = ksin = kb_ref = None
        if rope:
            if kv_int8:
                qcos, qsin = refs[idx:idx + 2]
                idx += 2
            else:
                qcos, qsin, kcos, ksin = refs[idx:idx + 4]
                idx += 4
        if kbias:
            kb_ref = refs[idx]
            idx += 1
        o_ref = refs[idx]
        q_scr = refs[idx + 1]
        if kv_int8:
            c_scr = refs[idx + 2]
            m0, a0, m1, a1 = refs[idx + 3:idx + 7]
        else:
            c_scr = None
            m0, a0, m1, a1 = refs[idx + 2:idx + 6]
        _cross_kernel(refs[0], refs[1], refs[2], qcos, qsin, kcos, ksin,
                      kb_ref, o_ref, q_scr, c_scr, m0, a0, m1, a1,
                      scale=scale * _LOG2E, nk_blocks=nk_blocks,
                      rope=rope, kbias=kbias, sub_k=sub_k, bk_in=bk,
                      int8=kv_int8)

    out = pl.pallas_call(
        kernel,
        grid=(B * P, Nqp // bq, nk_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, 128),
                               lambda g, i, j, P=P: (g // P, i, g % P)),
        out_shape=jax.ShapeDtypeStruct((B, Nqp, C), q.dtype),
        # per head: m carry (bq, 128) + acc (bq, 128) — acc lanes 64+
        # hold the l carry (same total scratch as the old m/l/acc trio).
        # int8: q_scr holds the row-quantized q8; c_scr its (bq, 1)
        # dequant scale broadcast to lanes.
        scratch_shapes=[pltpu.VMEM((bq, 128),
                                   jnp.int8 if kv_int8 else q.dtype)]
        + ([pltpu.VMEM((bq, 128), jnp.float32)] if kv_int8 else [])
        + [pltpu.VMEM((bq, 128), jnp.float32),
           pltpu.VMEM((bq, 128), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # The interleaved-heads body keeps ~4 (bq, bk) f32 tiles live
            # (s0, s1, p, one elementwise temp) — past the 16 MB default
            # scoped-VMEM cap at bq=1024, well inside v5e's physical
            # VMEM.  Sized from the tiles + double-buffered IO margin.
            vmem_limit_bytes=min(100 * 2**20,
                                 (2 * max(sub_k, 1) + 4) * bq * bk * 4
                                 + 16 * 2**20)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * 2 * P * Nq * Nk * 64,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * 2 * P * Nq * Nk,
        ),
    )(*args)
    return out[:, :Nq] if Nqp != Nq else out


def _cross_ref(q, k, v, qtab, ktab, kv_bias, scale):
    from panst3r_tpu.ops.attention import dot_product_attention
    from panst3r_tpu.ops.rope import apply_rope_tables

    C = q.shape[-1]
    qh, kh, vh = (_split_heads(t, C) for t in (q, k, v))
    if qtab is not None:
        qh = apply_rope_tables(qh, *qtab)
        kh = apply_rope_tables(kh, *ktab)
    bias = kv_bias[:, None, None, :] if kv_bias is not None else None
    out = dot_product_attention(qh, kh, vh, bias=bias, scale=scale)
    B, H, N, D = out.shape
    return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _tower_cross(q, k, v, qtab, ktab, kv_bias, scale, kv_int8=False):
    return _cross_fwd(q, k, v, qtab, ktab, kv_bias, scale,
                      kv_int8=kv_int8)


def _tower_cross_fwd(q, k, v, qtab, ktab, kv_bias, scale, kv_int8=False):
    return _cross_fwd(q, k, v, qtab, ktab, kv_bias, scale,
                      kv_int8=kv_int8), \
        (q, k, v, qtab, ktab, kv_bias)


def _tower_cross_bwd(scale, kv_int8, res, g):
    q, k, v, qtab, ktab, kv_bias = res
    _, vjp = jax.vjp(lambda q, k, v: _cross_ref(q, k, v, qtab, ktab,
                                                kv_bias, scale), q, k, v)
    dq, dk, dv = vjp(g)
    zt = jax.tree_util.tree_map(jnp.zeros_like, (qtab, ktab, kv_bias))
    return (dq, dk, dv, *zt)


_tower_cross.defvjp(_tower_cross_fwd, _tower_cross_bwd)


def tower_cross_attention(q, k, v, qtab=None, ktab=None, kv_bias=None,
                          scale=None, kv_int8=None):
    """Transpose-free cross-attention: q/k/v are the PROJECTED (B, N, C)
    streams (no head split — heads live as 128-lane pair blocks), with
    optional (cos, sin) RoPE tables per side and a per-key additive bias
    (B, Nk) — the token-memory validity bias (models/decoder.py
    memory_mask_bias; reference engine/must3r.py:76 mem_labels).
    Online softmax across key blocks: any memory length.

    ``kv_int8`` (default: env PANST3R_KV_INT8=1; requires RoPE tables,
    kv_bias ≤ 0): opt-in serving precision — the score matmul runs
    int8×int8 on the MXU (k per-tensor dynamic-amax quantized after
    pre-rotation, q per-row in-kernel; measured 1.92× the bf16 d=64
    MXU throughput on v5e).  The softmax weights shift by the int8
    quantization error (~1% relative); v/p stay bf16."""
    C = q.shape[-1]
    if scale is None:
        scale = 64 ** -0.5
    if kv_int8 is None:
        import os
        kv_int8 = os.environ.get("PANST3R_KV_INT8", "0") == "1"
    return _tower_cross(q, k, v, qtab, ktab, kv_bias, scale,
                        bool(kv_int8 and qtab is not None))


def supports_tower_attention(N: int, C: int, heads: int) -> bool:
    """Shape gate: N one k-block (≤ 1024), d=64 heads, pairable lanes."""
    return (N <= 1024 and C % 128 == 0 and heads * 64 == C
            and heads % 2 == 0)


def supports_tower_cross(Nq: int, Nk: int, C: int, heads: int) -> bool:
    """Cross variant: any Nk (online softmax); skip tiny shapes where the
    kernel grid overhead loses to XLA-native."""
    return (C % 128 == 0 and heads * 64 == C and heads % 2 == 0
            and Nq * Nk >= 256 * 256)


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
