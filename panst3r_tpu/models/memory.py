"""Cross-view token memory: fixed-capacity per-layer KV banks.

The reference's MUSt3R memory is a dynamically growing 5-tuple
`(mem_vals: list[Tensor (B, Nmem, D)] per layer, mem_labels, mem_nimgs,
mem_protected_imgs, mem_protected_tokens)`
(/root/reference/src/panst3r/engine/must3r.py:76-80,104-119).  Growing
shapes don't exist under jit, so the TPU design is a fixed-capacity ring:

- ``y``     (L, B, capacity, C): per-decoder-layer banks of pre-normalized
            key/value tokens ("norm_y" memory mode, configs/base.yaml:15).
- ``pos``   (B, capacity, 2): integer patch positions of the banked tokens
            (shared across layers — all layers bank the same views).
- ``valid`` (B, capacity) bool: slot validity (the reference's mem_labels
            role); invalid slots are masked out of cross-attention.
- ``count`` (): scalar int32 — number of occupied slots (uniform across the
            batch: every batch element inserts the same views).

Insertion is `dynamic_update_slice` at offset ``count``; the whole structure
is a pytree that threads through `lax.scan` for incremental memory building
and shards over the mesh ``mem`` axis at pod scale (SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TokenMemory(NamedTuple):
    y: jnp.ndarray      # (L, B, capacity, C)
    pos: jnp.ndarray    # (B, capacity, 2) int32
    valid: jnp.ndarray  # (B, capacity) bool
    count: jnp.ndarray  # () int32

    @property
    def capacity(self) -> int:
        return self.y.shape[2]

    @property
    def num_layers(self) -> int:
        return self.y.shape[0]


def init_memory(num_layers: int, batch: int, capacity: int, dim: int,
                dtype=jnp.float32) -> TokenMemory:
    return TokenMemory(
        y=jnp.zeros((num_layers, batch, capacity, dim), dtype),
        pos=jnp.zeros((batch, capacity, 2), jnp.int32),
        valid=jnp.zeros((batch, capacity), jnp.bool_),
        count=jnp.zeros((), jnp.int32),
    )


def evict(mem: TokenMemory, start: int | jnp.ndarray,
          n: int) -> TokenMemory:
    """Invalidate ``n`` slots from ``start`` (static n).

    The reference's memory carries `mem_protected_imgs` /
    `mem_protected_tokens` so must3r's pruning never drops anchor views
    (engine/must3r.py:76-80); here protection is the caller's policy —
    eviction just masks validity, and masked slots are skipped by
    attention (no compaction needed; capacity is reused via insert_at).
    """
    zeros = jnp.zeros((mem.valid.shape[0], n), jnp.bool_)
    valid = jax.lax.dynamic_update_slice(mem.valid, zeros, (0, start))
    return mem._replace(valid=valid)


def insert_at(mem: TokenMemory, y_new: jnp.ndarray, pos_new: jnp.ndarray,
              start) -> TokenMemory:
    """Overwrite ``n`` slots at ``start`` (ring-buffer reuse after evict)."""
    L, B, n, C = y_new.shape
    y = jax.lax.dynamic_update_slice(
        mem.y, y_new.astype(mem.y.dtype), (0, 0, start, 0))
    pos = jax.lax.dynamic_update_slice(mem.pos, pos_new, (0, start, 0))
    ones = jnp.ones((B, n), jnp.bool_)
    valid = jax.lax.dynamic_update_slice(mem.valid, ones, (0, start))
    count = jnp.maximum(mem.count, start + n)
    return TokenMemory(y=y, pos=pos, valid=valid, count=count)


def begin_overwrite(mem: TokenMemory, start, n: int) -> TokenMemory:
    """Open a ring-reuse window: invalidate ``n`` slots from ``start`` and
    move the write cursor there, so the next `insert` (e.g. inside a
    decoder update) lands in the freed window.  Close with
    `end_overwrite`.  This is the memory-module API for keyframe eviction
    with bounded capacity (reference's pruning over mem_labels,
    engine/must3r.py:76-80)."""
    mem = evict(mem, start, n)
    return mem._replace(count=jnp.asarray(start, jnp.int32))


def end_overwrite(mem: TokenMemory, occupancy) -> TokenMemory:
    """Close a ring-reuse window: restore the write cursor to the full
    occupancy so future appends go to the end again."""
    return mem._replace(count=jnp.asarray(occupancy, jnp.int32))


def insert(mem: TokenMemory, y_new: jnp.ndarray, pos_new: jnp.ndarray,
           ) -> TokenMemory:
    """Append tokens for all layers at the current write offset.

    y_new: (L, B, n, C); pos_new: (B, n, 2).  Caller guarantees
    count + n <= capacity (checked statically via capacity sizing).
    """
    L, B, n, C = y_new.shape
    start = mem.count
    y = jax.lax.dynamic_update_slice(
        mem.y, y_new.astype(mem.y.dtype), (0, 0, start, 0))
    pos = jax.lax.dynamic_update_slice(mem.pos, pos_new, (0, start, 0))
    ones = jnp.ones((B, n), jnp.bool_)
    valid = jax.lax.dynamic_update_slice(mem.valid, ones, (0, start))
    return TokenMemory(y=y, pos=pos, valid=valid, count=mem.count + n)
