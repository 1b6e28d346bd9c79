"""Device-mesh topology for SPMD execution.

The reference's only distributed mechanism is torch DDP over NCCL
(/root/reference/train.py:227-230, README.md:184-190).  Here the whole
parallelism story is one `jax.sharding.Mesh` with named axes:

- ``data``   — data parallelism (batch axis).  Gradient all-reduce is implicit
               in jit, replacing DDP.
- ``mem``    — the memory/KV-token axis: the MUSt3R cross-view token memory and
               the mask-transformer's concatenated multi-view tokens are sharded
               along this axis (the sequence-parallel analog for this model
               family; see SURVEY.md §5.7).
- ``model``  — tensor parallelism: attention heads and MLP hidden units split
               Megatron-style (core/tp.py); GSPMD inserts the all-reduces
               after each out-projection/fc2.

On a multi-host pod slice the ``data`` axis should span DCN (hosts) and the
``mem``/``model`` axes ICI (chips within a slice) so memory-attention and
TP collectives ride the fast interconnect; ``model`` is innermost (most
bandwidth-hungry: one all-reduce per block).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MEM_AXIS = "mem"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh description.

    ``data`` / ``mem`` / ``model`` give the axis sizes; ``-1`` means "all
    remaining devices".  Defaults to a single-axis data mesh.
    """

    data: int = -1
    mem: int = 1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        data, mem, model = self.data, self.mem, self.model
        if (data, mem, model).count(-1) > 1:
            raise ValueError("at most one mesh axis may be -1")
        if mem == -1:
            mem = n_devices // (max(data, 1) * max(model, 1))
        if model == -1:
            model = n_devices // (max(data, 1) * max(mem, 1))
        if data == -1:
            data = n_devices // (max(mem, 1) * max(model, 1))
        if data * mem * model != n_devices:
            raise ValueError(
                f"mesh {data}x{mem}x{model} does not cover "
                f"{n_devices} devices")
        return data, mem, model


def build_mesh(spec: MeshSpec | None = None,
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 3-D (data, mem, model) mesh over the given devices.

    Devices are laid out so that the ``model`` axis is innermost
    (contiguous device ids → ICI-adjacent on TPU slices), then ``mem`` —
    keeping the chattiest collectives on the fastest links.
    """
    spec = spec or MeshSpec()
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if spec.data > 0 and spec.mem > 0 and spec.model > 0 \
            and spec.data * spec.mem * spec.model < devices.size:
        # Explicit sub-mesh: use the first data*mem*model devices.
        devices = devices[:spec.data * spec.mem * spec.model]
    data, mem, model = spec.resolve(devices.size)
    grid = devices.reshape(data, mem, model)
    return Mesh(grid, (DATA_AXIS, MEM_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                (DATA_AXIS, MEM_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, *trailing: Optional[str]) -> NamedSharding:
    """Sharding with the leading axis on ``data`` and given trailing axes."""
    return NamedSharding(mesh, P(DATA_AXIS, *trailing))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mem_sharding(mesh: Mesh, axis_index: int, ndim: int) -> NamedSharding:
    """Shard axis ``axis_index`` of an ``ndim``-array over the mem axis."""
    spec = [None] * ndim
    spec[axis_index] = MEM_AXIS
    return NamedSharding(mesh, P(*spec))


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)
