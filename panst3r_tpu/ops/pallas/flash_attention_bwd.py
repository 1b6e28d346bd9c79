"""Pallas flash-attention backward kernels.

FlashAttention-2-style backward: the forward saves per-row log-sum-exp
(`_flash_fwd(..., with_lse=True)`), the backward recomputes attention
probabilities blockwise from (q, k, lse) — the (Nq, Nk) logits never
materialize in HBM (previously the custom VJP fell back to a jnp recompute
that did).  Two kernels:

- ``dq``   — grid over q blocks, accumulate over kv blocks:
             p = exp(s − lse); dp = do·vᵀ; ds = p⊙(dp − D)·scale; dq += ds·k
- ``dkdv`` — grid over kv blocks, accumulate over q blocks:
             dv += pᵀ·do;  dk += dsᵀ·q

where D = rowsum(do ⊙ o) is precomputed in jnp (one elementwise pass).
Bias is treated as non-differentiable (both model uses are stop_gradient /
±inf validity masks).  The fused-RoPE variant rotates q/k in-kernel like
the forward; the wrapper adjoints the rotation on dq/dk:
r(x) = x⊙cos + R(x)⊙sin  ⇒  rᵀ(g) = g⊙cos − R(g⊙sin)  (R⊤ = −R).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from panst3r_tpu.ops.pallas.flash_attention import (_NEG_INF, _rot2d,
                                                    _round_up)


def _probs(q, k, bias_ref, kvalid_ref, lse, scale):
    # Operands stay in the input dtype (bf16 in production — f32×f32 runs
    # at ~1/4 the MXU rate), accumulation in f32.
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    if kvalid_ref is not None:
        s = jnp.where(kvalid_ref[0] != 0, s, _NEG_INF)
    p = jnp.exp(s - lse)
    p = jnp.where((s <= _NEG_INF / 2) | (lse <= _NEG_INF / 2)
                  | (lse >= -_NEG_INF / 2), 0.0, p)
    return p


def _load_qk(q_ref, k_ref, rope_refs, rope_d):
    """Returns (q, k) in the INPUT dtype (rotation computed in f32)."""
    if rope_refs[0] is None:
        return q_ref[0], k_ref[0]
    qcos, qsin, kcos, ksin = rope_refs
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    q = q * qcos[0] + _rot2d(q, rope_d) * qsin[0]
    k = k * kcos[0] + _rot2d(k, rope_d) * ksin[0]
    return q.astype(q_ref.dtype), k.astype(k_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref,
               bias_ref, kvalid_ref, qcos, qsin, kcos, ksin,
               dq_ref, acc, *, scale, nk_blocks, rope_d):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    q, k = _load_qk(q_ref, k_ref, (qcos, qsin, kcos, ksin), rope_d)
    lse = lse_ref[0][:, :1]                          # (bq, 1)
    p = _probs(q, k, bias_ref, kvalid_ref, lse, scale)
    dp = jax.lax.dot_general(do_ref[0], v_ref[0],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dvec_ref[0][:, :1]) * scale       # (bq, bk)
    acc[...] += jax.lax.dot(ds.astype(k.dtype), k,
                            preferred_element_type=jnp.float32)

    @pl.when(ik == nk_blocks - 1)
    def _fin():
        dq_ref[0] = acc[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref,
                bias_ref, kvalid_ref, qcos, qsin, kcos, ksin,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale, nq_blocks, rope_d):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q, k = _load_qk(q_ref, k_ref, (qcos, qsin, kcos, ksin), rope_d)
    lse = lse_ref[0][:, :1]
    p = _probs(q, k, bias_ref, kvalid_ref, lse, scale)   # (bq, bk)
    do = do_ref[0]
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (bk, d)
    dp = jax.lax.dot_general(do, v_ref[0],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dvec_ref[0][:, :1]) * scale
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (bk, d)

    @pl.when(iq == nq_blocks - 1)
    def _fin():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def flash_bwd(q, k, v, bias, kv_valid, rope, o, lse, do, scale,
              block_q: int = 256, block_k: int = 512):
    """Returns (dq, dk, dv) — gradients w.r.t. the UNROTATED q/k/v."""
    from panst3r_tpu.ops.pallas.flash_attention import fold_kv_valid

    bias, kv_valid = fold_kv_valid(bias, kv_valid)
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    block_q = min(block_q, _round_up(Nq, 128))
    block_k = min(block_k, _round_up(Nk, 128))
    Dp = _round_up(D, 128)
    Nqp = _round_up(Nq, block_q)
    Nkp = _round_up(Nk, block_k)

    if Nkp != Nk and kv_valid is None and bias is None:
        kv_valid = jnp.ones((B, Nk), jnp.bool_)

    def pad(x, axis, target, value=0.0):
        if x.shape[axis] == target:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, cfg, constant_values=value)

    qf = pad(pad(q, 3, Dp), 2, Nqp).reshape(B * H, Nqp, Dp)
    kf = pad(pad(k, 3, Dp), 2, Nkp).reshape(B * H, Nkp, Dp)
    vf = pad(pad(v, 3, Dp), 2, Nkp).reshape(B * H, Nkp, Dp)
    dof = pad(pad(do.astype(q.dtype), 3, Dp), 2, Nqp).reshape(B * H, Nqp, Dp)
    # Padded q rows get lse = +inf → p = 0 (no dk/dv contribution).
    lsef = pad(lse.astype(jnp.float32), 2, Nqp, value=-_NEG_INF)
    lsef = jnp.broadcast_to(lsef.reshape(B * H, Nqp, 1),
                            (B * H, Nqp, 128))
    dvec = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(-1)
    dvecf = pad(dvec, 2, Nqp).reshape(B * H, Nqp, 1)
    dvecf = jnp.broadcast_to(dvecf, (B * H, Nqp, 128))

    nq_blocks = Nqp // block_q
    nk_blocks = Nkp // block_k

    def spec_q(i3):  # (b, iq, ik)-indexed q-row blocks
        return pl.BlockSpec((1, block_q, i3), lambda b, i, j: (b, i, 0))

    def spec_k(i3):
        return pl.BlockSpec((1, block_k, i3), lambda b, i, j: (b, j, 0))

    # ---- optional inputs -------------------------------------------------
    bias_in = bias is not None
    kvalid_in = kv_valid is not None and not bias_in
    rope_in = rope is not None
    extras_q, extras_kv, especs_q, especs_kv = [], [], [], []
    if bias_in:
        bias_full = jnp.broadcast_to(bias, (B, H, Nq, Nk)).astype(jnp.float32)
        bias_full = pad(pad(bias_full, 3, Nkp, _NEG_INF), 2, Nqp)
        bias_full = bias_full.reshape(B * H, Nqp, Nkp)
        extras_q.append(bias_full)
        especs_q.append(pl.BlockSpec((1, block_q, block_k),
                                     lambda b, i, j: (b, i, j)))
        extras_kv.append(bias_full)
        especs_kv.append(pl.BlockSpec((1, block_q, block_k),
                                      lambda b, i, j: (b, j, i)))
    if kvalid_in:
        kvm = pad(kv_valid.astype(jnp.int32), 1, Nkp)[:, None, :]
        extras_q.append(kvm)
        especs_q.append(pl.BlockSpec((1, 1, block_k),
                                     lambda b, i, j, H=H: (b // H, 0, j)))
        extras_kv.append(kvm)
        especs_kv.append(pl.BlockSpec((1, 1, block_k),
                                      lambda b, i, j, H=H: (b // H, 0, i)))
    if rope_in:
        qcos, qsin, kcos, ksin = rope

        def pad_tab(t, n_target, one):
            t = t.astype(jnp.float32)
            return jnp.pad(t, ((0, 0), (0, n_target - t.shape[1]),
                               (0, Dp - D)),
                           constant_values=1.0 if one else 0.0)

        tabs = [pad_tab(qcos, Nqp, True), pad_tab(qsin, Nqp, False),
                pad_tab(kcos, Nkp, True), pad_tab(ksin, Nkp, False)]
        extras_q += tabs
        especs_q += [
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j, H=H: (b // H, i, 0)),
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j, H=H: (b // H, i, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j, H=H: (b // H, j, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j, H=H: (b // H, j, 0)),
        ]
        extras_kv += tabs
        especs_kv += [
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j, H=H: (b // H, j, 0)),
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j, H=H: (b // H, j, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j, H=H: (b // H, i, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j, H=H: (b // H, i, 0)),
        ]

    def unpack(refs, n_fixed):
        idx = n_fixed
        bias_ref = refs[idx] if bias_in else None
        idx += int(bias_in)
        kvalid_ref = refs[idx] if kvalid_in else None
        idx += int(kvalid_in)
        rr = refs[idx:idx + 4] if rope_in else (None,) * 4
        idx += 4 * int(rope_in)
        return bias_ref, kvalid_ref, rr, idx

    # ---- dq --------------------------------------------------------------
    def dq_kernel(*refs):
        bias_ref, kvalid_ref, rr, idx = unpack(refs, 6)
        _dq_kernel(refs[0], refs[1], refs[2], refs[3], refs[4], refs[5],
                   bias_ref, kvalid_ref, *rr, refs[idx], refs[idx + 1],
                   scale=scale, nk_blocks=nk_blocks,
                   rope_d=D if rope_in else 0)

    dq = pl.pallas_call(
        dq_kernel,
        grid=(B * H, nq_blocks, nk_blocks),
        in_specs=[spec_q(Dp), spec_k(Dp), spec_k(Dp), spec_q(Dp),
                  spec_q(128), spec_q(128)] + especs_q,
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Nqp, Dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, Dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qf, kf, vf, dof, lsef, dvecf, *extras_q)

    # ---- dk / dv ---------------------------------------------------------
    def dkv_kernel(*refs):
        bias_ref, kvalid_ref, rr, idx = unpack(refs, 6)
        _dkv_kernel(refs[0], refs[1], refs[2], refs[3], refs[4], refs[5],
                    bias_ref, kvalid_ref, *rr, refs[idx], refs[idx + 1],
                    refs[idx + 2], refs[idx + 3],
                    scale=scale, nq_blocks=nq_blocks,
                    rope_d=D if rope_in else 0)

    # grid: (bh, kv block, q block) — q innermost (accumulation axis).
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B * H, nk_blocks, nq_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, j, 0)),   # q
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, i, 0)),   # k
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, i, 0)),   # v
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, j, 0)),   # do
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, j, 0)),  # lse
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, j, 0)),  # D
        ] + especs_kv,
        out_specs=(
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Nkp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Nkp, Dp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((block_k, Dp), jnp.float32),
                        pltpu.VMEM((block_k, Dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qf, kf, vf, dof, lsef, dvecf, *extras_kv)

    dq = dq.reshape(B, H, Nqp, Dp)[:, :, :Nq, :D]
    dk = dk.reshape(B, H, Nkp, Dp)[:, :, :Nk, :D]
    dv = dv.reshape(B, H, Nkp, Dp)[:, :, :Nk, :D].astype(v.dtype)

    if rope_in:
        # Adjoint of the rotation: rᵀ(g) = g⊙cos − R(g⊙sin).
        from panst3r_tpu.ops.rope import _rotate_half_2d

        qcos, qsin, kcos, ksin = rope
        dq = dq * qcos[:, None] - _rotate_half_2d(dq * qsin[:, None])
        dk = dk * kcos[:, None] - _rotate_half_2d(dk * ksin[:, None])
    return dq.astype(q.dtype), dk.astype(k.dtype), dv
