"""Memory-sharded cross-attention over the mesh ``mem`` axis.

The reference has no sequence/context parallelism; its long-context axis is
the cross-view token memory (Nmem = keyframes × tokens/view — SURVEY.md
§5.7).  This module is the TPU-native scaling mechanism for that axis
(BASELINE "sharded memory-attention over ICI"): the per-layer KV banks are
sharded along capacity across devices; queries are replicated along ``mem``;
each device computes flash-style partial results against its KV shard and
the partials combine with a numerically-stable log-sum-exp reduction over
XLA collectives (pmax + psum) — one round of ICI traffic of size O(B·Nq·D),
independent of memory length.

Two entry points:
- ``sharded_memory_attention`` — explicit shard_map version (inference
  engine, pod-scale serving).
- GSPMD path: the decoder simply applies a sharding constraint on the KV
  banks (models/decoder.py ``kv_shard``) and XLA derives the same schedule
  inside jit (training).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from panst3r_tpu.core.mesh import MEM_AXIS

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _partial_attention(q, k, v, bias):
    """Local flash-style partials: (o_unnormalized, row_sum, row_max)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    m_local = s.max(axis=-1, keepdims=True)                  # (B,H,Q,1)
    m_global = jax.lax.pmax(m_local, MEM_AXIS)
    safe_m = jnp.where(m_global <= _NEG_INF / 2, 0.0, m_global)
    p = jnp.exp(s - safe_m)
    p = jnp.where(s <= _NEG_INF / 2, 0.0, p)
    o_num = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    l_local = p.sum(axis=-1, keepdims=True)
    return o_num, l_local


def sharded_memory_attention(mesh: Mesh, q: jnp.ndarray, k: jnp.ndarray,
                             v: jnp.ndarray,
                             kv_valid: Optional[jnp.ndarray] = None
                             ) -> jnp.ndarray:
    """q: (B, H, Nq, D) replicated over mem; k/v: (B, H, M, D) sharded on M;
    kv_valid: (B, M) bool sharded on M.  Returns (B, H, Nq, D) replicated.
    """

    def local(q, k, v, valid):
        bias = None
        if valid is not None:
            bias = jnp.where(valid, 0.0, _NEG_INF)[:, None, None, :]
        o_num, l_local = _partial_attention(q, k, v, bias)
        o = jax.lax.psum(o_num.astype(jnp.float32), MEM_AXIS)
        l = jax.lax.psum(l_local, MEM_AXIS)
        return (o / jnp.maximum(l, 1e-20)).astype(q.dtype)

    kv_spec = P(None, None, MEM_AXIS, None)
    if kv_valid is None:
        fn = shard_map(lambda q, k, v: local(q, k, v, None), mesh=mesh,
                       in_specs=(P(), kv_spec, kv_spec), out_specs=P())
        return fn(q, k, v)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), kv_spec, kv_spec, P(None, MEM_AXIS)),
                   out_specs=P())
    return fn(q, k, v, kv_valid)


def ring_memory_attention(mesh: Mesh, q: jnp.ndarray, k: jnp.ndarray,
                          v: jnp.ndarray,
                          kv_valid: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
    """Ring variant: KV shards rotate around the ``mem`` ring (ppermute)
    while each device accumulates flash-style running (max, sum, acc) over
    its resident queries.

    Trade-off vs `sharded_memory_attention`: the ring moves the KV shards
    (n−1 hops of the KV bytes, overlappable with compute) instead of one
    psum of the O(B·Nq·D) outputs — preferable when queries are large
    relative to a KV shard, or when queries are themselves sharded and the
    output must stay local.  Same math; both are exact.

    q: (B, H, Nq, D) replicated over mem; k/v sharded on the token axis;
    kv_valid: (B, M) bool sharded.  Returns (B, H, Nq, D) replicated.
    """
    n = mesh.shape[MEM_AXIS]

    def local(q, k, v, valid):
        def step(carry, _):
            k, v, valid, m_run, l_run, acc = carry
            scale = q.shape[-1] ** -0.5
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            if valid is not None:
                s = jnp.where(valid[:, None, None, :], s, _NEG_INF)
            m_blk = s.max(-1, keepdims=True)
            m_new = jnp.maximum(m_run, m_blk)
            safe = jnp.where(m_new <= _NEG_INF / 2, 0.0, m_new)
            p = jnp.exp(s - safe)
            p = jnp.where(s <= _NEG_INF / 2, 0.0, p)
            alpha = jnp.exp(m_run - safe)
            alpha = jnp.where(m_run <= _NEG_INF / 2, 0.0, alpha)
            l_new = alpha * l_run + p.sum(-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(jnp.float32)
            # Rotate KV shard to the next ring neighbor.
            perm = [(i, (i + 1) % n) for i in range(n)]
            k = jax.lax.ppermute(k, MEM_AXIS, perm)
            v = jax.lax.ppermute(v, MEM_AXIS, perm)
            if valid is not None:
                valid = jax.lax.ppermute(valid, MEM_AXIS, perm)
            return (k, v, valid, m_new, l_new, acc), None

        B, H, Nq, D = q.shape

        def vary(x):  # mark replicated inits as mem-varying (scan carry typing)
            if hasattr(jax.lax, "pcast"):          # jax >= 0.9
                return jax.lax.pcast(x, (MEM_AXIS,), to="varying")
            try:
                return jax.lax.pvary(x, (MEM_AXIS,))
            except AttributeError:  # older jax: no vma tracking
                return x

        init = (k, v, valid,
                vary(jnp.full((B, H, Nq, 1), _NEG_INF)),
                vary(jnp.zeros((B, H, Nq, 1))),
                vary(jnp.zeros((B, H, Nq, D))))
        (k, v, valid, m, l, acc), _ = jax.lax.scan(step, init, None,
                                                   length=n)
        out = acc / jnp.maximum(l, 1e-20)
        # All devices saw all shards → result already replicated; a pmean
        # re-asserts replication for out_specs=P().
        return jax.lax.pmean(out.astype(q.dtype), MEM_AXIS)

    kv_spec = P(None, None, MEM_AXIS, None)
    if kv_valid is None:
        fn = shard_map(lambda q, k, v: local(q, k, v, None), mesh=mesh,
                       in_specs=(P(), kv_spec, kv_spec), out_specs=P())
        return fn(q, k, v)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), kv_spec, kv_spec, P(None, MEM_AXIS)),
                   out_specs=P())
    return fn(q, k, v, kv_valid)
