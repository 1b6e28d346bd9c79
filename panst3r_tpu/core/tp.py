"""Tensor parallelism: Megatron-style param shardings over the ``model``
mesh axis.

The reference has no tensor parallelism (its only distributed mechanism is
DDP, /root/reference/train.py:227-230); this is the TPU-native scaling
path for models whose weights outgrow one chip.  Scheme (GSPMD — we
annotate the *parameters*, XLA propagates to activations and inserts the
collectives):

- column-parallel (output dim on ``model``): q/k/v projections (packed
  ``qkv`` or separate ``projq/projk/projv`` / ``q_proj…``), MLP ``fc1``;
  their biases shard the same way.
- row-parallel (input dim on ``model``): attention ``proj`` /
  ``out_proj``, MLP ``fc2``; biases replicated (added once after the
  partial-sum all-reduce XLA inserts).
- everything else replicated.  Dims not divisible by the ``model`` axis
  size stay replicated (e.g. the 7-channel pointmap head).

Scanned stacks (``blocks/block``, ``layers/*``) have a leading layer
axis; the rules below index from the trailing dims so they apply
unchanged.

One all-reduce per block per direction — the Megatron pattern; lay the
``model`` axis innermost on the mesh so it rides ICI (core/mesh.py).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from panst3r_tpu.core.mesh import MODEL_AXIS

_COL_PARALLEL = {"qkv", "projq", "projk", "projv", "q_proj", "k_proj",
                 "v_proj", "fc1"}
_ROW_PARALLEL = {"proj", "out_proj", "fc2"}


def _names(path) -> list[str]:
    return [str(getattr(p, "key", "")) for p in path]


def tp_spec(path, leaf, model_size: int) -> P:
    """PartitionSpec for one param leaf under tensor parallelism."""
    names = _names(path)
    leafname = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    col = parent in _COL_PARALLEL or parent.startswith("ffn_fc1")
    row = parent in _ROW_PARALLEL or parent.startswith("ffn_fc2")

    spec = [None] * leaf.ndim
    if leafname == "kernel" and leaf.ndim >= 2:
        if col and leaf.shape[-1] % model_size == 0:
            spec[-1] = MODEL_AXIS
        elif row and leaf.shape[-2] % model_size == 0:
            spec[-2] = MODEL_AXIS
    elif leafname == "bias" and col and leaf.shape[-1] % model_size == 0:
        spec[-1] = MODEL_AXIS
    return P(*spec)


def tp_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings implementing TP over ``mesh``'s model axis."""
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_spec(path, leaf,
                                                      model_size)),
        params)


def apply_tp(params, mesh: Mesh):
    """Place params on the mesh with TP shardings (weights split across
    the ``model`` axis; non-TP leaves replicated)."""
    return jax.tree_util.tree_map(
        jax.device_put, params, tp_shardings(params, mesh))
