"""RNG discipline.

The reference seeds torch/numpy per rank and epoch
(/root/reference/src/panst3r/engine/train.py:80-83).  JAX is functional:
one root key, split deterministically by (epoch, step, name).  No global
state, no per-rank divergence bugs — the same key tree is computed on every
host and folded with the data-parallel index only where divergence is wanted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    return jax.random.fold_in(key, epoch)


def step_key(key: jax.Array, step) -> jax.Array:
    return jax.random.fold_in(key, step)


def named_key(key: jax.Array, name: str) -> jax.Array:
    # Stable string hash (Python's hash() is salted per process).
    h = 2166136261
    for ch in name.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return jax.random.fold_in(key, jnp.uint32(h))
