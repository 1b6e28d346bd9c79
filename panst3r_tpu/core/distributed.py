"""Multi-host initialization & rank utilities.

Replaces the reference's torchrun + `init_distributed_mode` NCCL rendezvous
(/root/reference/train.py:132, croco.utils.misc): JAX's single-controller
SPMD needs one `jax.distributed.initialize()` per host, after which
`jax.devices()` spans the pod slice and the (data × mem) mesh
(core/mesh.py) covers ICI+DCN — collectives are compiled into the jitted
step, there is no backend code.

Env contract (same spirit as torchrun's env://):
  COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID — or any scheduler that
  jax.distributed auto-detects.
"""
from __future__ import annotations

import os

import jax


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-host JAX (no-op for single-host runs)."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or int(
        os.environ.get("NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id if process_id is not None
        else int(os.environ.get("PROCESS_ID", "0")))


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Rank-0 gate for host-side IO (reference save_on_master semantics;
    orbax checkpointing itself is already multi-host-aware)."""
    return jax.process_index() == 0
