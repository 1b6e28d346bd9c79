"""A/B: head-packed d=64 flash attention vs the shipped unpadded kernel.

VERDICT r3 #1: both attention matmuls at d=64 run at 50% MXU rate (the
128-lane systolic contraction is half-filled).  That 50% is a THEOREM for
the matmuls themselves: scores/outputs of two heads need block-diagonal
operands, and structural zeros burn the same MXU passes they save (see
PERFORMANCE.md round-4 note).  What packing CAN buy is the memory system:
XLA stores (…, 64) arrays lane-padded to 128 in HBM — the kernel's
q/k/v/o operands pay 2x HBM traffic and half-empty VPU registers for every
elementwise pass.  The packed layout (B, H/2, N, 128) carries two heads
per 128-lane register: dense HBM, full vregs, same matmul passes (lane
slices at 0:64/64:128 feed the same half-filled MXU contractions).

This tool measures, at the encoder tower shape (B=8 views, H=16, N=768,
D=64, bf16, 24-layer scan):
  a) shipped pallas kernel  (B,H,N,64) blocks
  b) packed prototype       (B,H/2,N,128) blocks, two softmax streams
  c) XLA-native attention
  d) the d=64 MXU roofline (4·B·H·N²·D at 50% of peak)
including the (B,N,C) -> kernel-layout transposes both paths pay.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)
_LOG2E = float(np.log2(np.e))


def _packed_kernel(q_ref, k_ref, v_ref, o_ref,
                   m0, l0, a0, m1, l1, a1, *, scale, nk_blocks):
    """Two heads per 128-lane block; two online-softmax streams."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        for m, l, a in ((m0, l0, a0), (m1, l1, a1)):
            m[...] = jnp.full_like(m, _NEG_INF)
            l[...] = jnp.zeros_like(l)
            a[...] = jnp.zeros_like(a)

    q = q_ref[...]                       # (G, bq, 128) = two heads
    k = k_ref[...]                       # (G, bk, 128)
    v = v_ref[...]

    def stream(sl, m_scr, l_scr, acc_scr):
        s = jax.lax.dot_general(
            q[..., sl], k[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m_prev = m_scr[:, :, :1]
        l_prev = l_scr[:, :, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
        acc_scr[...] = acc

    stream(slice(0, 64), m0, l0, a0)
    stream(slice(64, 128), m1, l1, a1)

    @pl.when(ik == nk_blocks - 1)
    def _fin():
        out0 = a0[...] / l0[:, :, :1]
        out1 = a1[...] / l1[:, :, :1]
        o_ref[...] = jnp.concatenate([out0, out1], axis=-1).astype(o_ref.dtype)


def packed_mha(q, k, v, scale=None, block_q=768, block_k=768):
    """q/k/v: (B, P, N, 128) with P = H//2 head pairs."""
    B, P, N, Dp = q.shape
    assert Dp == 128
    scale = (scale or 64 ** -0.5) * _LOG2E
    qf = q.reshape(B * P, N, Dp)
    kf = k.reshape(B * P, N, Dp)
    vf = v.reshape(B * P, N, Dp)

    G = 1
    while (B * P) % (G * 2) == 0 and \
            2 * G * block_q * block_k * 4 <= 4_800_000:
        G *= 2
    grid = (B * P // G, N // block_q, N // block_k)

    out = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale,
                          nk_blocks=N // block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, block_q, Dp), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((G, block_k, Dp), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((G, block_k, Dp), lambda g, i, j: (g, j, 0)),
        ],
        out_specs=pl.BlockSpec((G, block_q, Dp), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * P, N, Dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((G, block_q, 128), jnp.float32),
                        pltpu.VMEM((G, block_q, 128), jnp.float32),
                        pltpu.VMEM((G, block_q, 64), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * P * 2 * N * N * 64,
            bytes_accessed=(qf.size + kf.size + vf.size) * 2,
            transcendentals=B * P * 2 * N * N),
    )(qf, kf, vf)
    return out.reshape(B, P, N, Dp)


def main():
    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from panst3r_tpu.ops.attention import dot_product_attention
    from panst3r_tpu.ops.pallas.flash_attention import pallas_mha

    B, H, N, D = 8, 16, 768, 64
    L = int(os.environ.get("AB_LAYERS", "24"))
    rng = np.random.default_rng(0)
    # Start from the projection layout (B, N, H*D) like the tower does, so
    # every variant pays its own relayout.
    x = jnp.asarray(rng.standard_normal((B, N, H * D)) * 0.3, jnp.bfloat16)
    kx = jnp.asarray(rng.standard_normal((B, N, H * D)) * 0.3, jnp.bfloat16)
    vx = jnp.asarray(rng.standard_normal((B, N, H * D)), jnp.bfloat16)

    def split_heads(t):                   # (B, N, H, D) -> (B, H, N, D)
        return t.reshape(B, N, H, D).transpose(0, 2, 1, 3)

    def split_pairs(t):                   # -> (B, H/2, N, 128)
        return t.reshape(B, N, H // 2, 128).transpose(0, 2, 1, 3)

    def merge_heads(t):
        return t.transpose(0, 2, 1, 3).reshape(B, N, H * D)

    def scan_of(fn):
        def step(c, _):
            return fn(c), ()
        return jax.jit(lambda q: jax.lax.scan(step, q, None, length=L)[0])

    from panst3r_tpu.ops.pallas.flash_attention import (
        pallas_mha_rope2d_tables)
    from panst3r_tpu.ops.pallas.tower_attention import tower_self_attention
    from panst3r_tpu.ops.rope import patch_grid_positions, rope2d_tables

    pos = jnp.broadcast_to(patch_grid_positions(N // 32, 32)[None],
                           (B, N, 2))
    tabs = rope2d_tables(pos, D, 100.0)

    # The tower variants receive (B, N, 3C) — in the real model the qkv
    # Dense writes that layout directly; the concat here is extra cost the
    # model does not pay, so tower numbers are upper bounds.
    variants = {
        "pallas-unpacked": scan_of(lambda c: merge_heads(pallas_mha(
            split_heads(c), split_heads(kx), split_heads(vx)))),
        "pallas-packed": scan_of(lambda c:
                                 packed_mha(split_pairs(c), split_pairs(kx),
                                            split_pairs(vx))
                                 .transpose(0, 2, 1, 3).reshape(B, N, H * D)),
        "xla-native": scan_of(lambda c: merge_heads(dot_product_attention(
            split_heads(c), split_heads(kx), split_heads(vx)))),
        "pallas-rope-tabs": scan_of(lambda c: merge_heads(
            pallas_mha_rope2d_tables(split_heads(c), split_heads(kx),
                                     split_heads(vx), tabs[0], tabs[1],
                                     tabs[0], tabs[1]))),
        "tower-plain": scan_of(lambda c: tower_self_attention(
            jnp.concatenate([c, kx, vx], -1), H)),
        "tower-rope": scan_of(lambda c: tower_self_attention(
            jnp.concatenate([c, kx, vx], -1), H, tabs=tabs)),
    }

    # parity check (packed vs unpacked), CPU-tolerant
    o_ref = pallas_mha(split_heads(x), split_heads(kx), split_heads(vx))
    o_pk = packed_mha(split_pairs(x), split_pairs(kx), split_pairs(vx))
    o_pk = o_pk.reshape(B, H // 2, N, 2, 64).transpose(0, 1, 3, 2, 4) \
        .reshape(B, H, N, 64)
    err = float(jnp.abs(o_ref.astype(jnp.float32) -
                        o_pk.astype(jnp.float32)).max())
    print(f"packed-vs-unpacked max abs err: {err:.2e}")

    tiny = jax.jit(lambda t: t + 1.0)
    np.asarray(tiny(jnp.zeros(8)))
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(tiny(jnp.zeros(8)))
    rtt = (time.perf_counter() - t0) / 10
    print(f"RTT floor: {rtt * 1e3:.2f} ms")

    roofline = 4 * B * H * N * N * D / (197e12 * 0.5) * 1e3
    print(f"d=64 MXU roofline (50% lane cap): {roofline:.3f} ms/layer")

    for name, fn in variants.items():
        out = fn(x)
        np.asarray(out[0, 0, :2])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(x)
            np.asarray(out[0, 0, :2])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:18s} {best * 1e3:8.1f} ms total  "
              f"{(best - rtt) / L * 1e3:6.3f} ms/layer")


if __name__ == "__main__":
    main()
