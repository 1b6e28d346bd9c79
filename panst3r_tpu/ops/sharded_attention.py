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
