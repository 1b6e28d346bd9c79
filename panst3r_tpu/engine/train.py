"""Training engine: pjit data-parallel train step, schedule, epoch loop.

TPU-native equivalent of the reference training stack:

- torch DDP + NCCL all-reduce (/root/reference/train.py:227-230) → one jit
  over a `Mesh(('data', 'mem'))` with the batch sharded on ``data``;
  gradient all-reduce is implicit in GSPMD.
- `NativeScalerWithGradNormCount` (AMP grad scaling + clipping,
  train.py:236) → no loss scaler needed with bf16 compute on TPU; global
  grad-norm clipping via optax.
- `adjust_learning_rate` per-iter warmup+cosine (croco;
  engine/train.py:98-99) → an optax-style schedule over fractional epochs.
- grad accumulation (engine/train.py:122-127) → optax.MultiSteps.
- weight-decay grouping (must3r get_parameter_groups; no decay on
  bias/norm params) → optax.masked adamw.
- NaN abort (engine/train.py:118-120) → host-side check on the returned
  loss.
"""
from __future__ import annotations

import contextlib
import dataclasses
import math
from typing import Any, Optional

_nullcontext = contextlib.nullcontext

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from panst3r_tpu.core import config as cfg
from panst3r_tpu.core.mesh import DATA_AXIS
from panst3r_tpu.engine.criterion import (PanopticLossConfig, Targets,
                                          panoptic_loss)


@cfg.register
@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # reference configs/base.yaml:55-85 hyperparameters
    epochs: int = 200
    warmup_epochs: int = 5
    lr: Optional[float] = 1e-4
    blr: float = 1.5e-4          # base lr, scaled by eff_bs/256 if lr None
    min_lr: float = 1e-6
    weight_decay: float = 0.05
    betas: tuple = (0.9, 0.95)
    batch_size: int = 2
    accum_iter: int = 2
    clip_grad: Optional[float] = None
    seed: int = 777
    max_instances: int = 48
    # AMP analog (reference amp flag, configs/base.yaml:76): 'bf16' runs
    # f32-parameter matmuls at bf16 MXU precision (no loss scaler needed on
    # TPU); None keeps full f32.
    amp: Optional[str] = None
    loss: PanopticLossConfig = PanopticLossConfig()

    def effective_lr(self, world_size: int) -> float:
        eff_bs = self.batch_size * self.accum_iter * world_size
        if self.lr is not None:
            return self.lr
        return self.blr * eff_bs / 256.0     # reference train.py:211-214


def cosine_lr(config: TrainConfig, world_size: int, steps_per_epoch: int):
    """Per-iteration warmup + cosine schedule (croco adjust_learning_rate)."""
    peak = config.effective_lr(world_size)

    def schedule(step):
        epoch_f = step / steps_per_epoch
        warm = peak * epoch_f / max(config.warmup_epochs, 1e-8)
        prog = (epoch_f - config.warmup_epochs) / max(
            config.epochs - config.warmup_epochs, 1e-8)
        cos = config.min_lr + (peak - config.min_lr) * 0.5 * (
            1.0 + jnp.cos(math.pi * jnp.clip(prog, 0.0, 1.0)))
        return jnp.where(epoch_f < config.warmup_epochs, warm, cos)

    return schedule


def _decay_mask(params) -> Any:
    """No weight decay on biases, norm scales, or embedding-like 1-D params
    (must3r get_parameter_groups semantics)."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def trainable_mask(params, trainable_modules=("panoptic_decoder",)) -> Any:
    """Pytree mask: True for params under a trainable top-level module.

    The reference's freeze policy trains only the panoptic decoder by
    default (train.py:219-222); masking the optimizer skips Adam moment
    allocation for frozen submodules — on a 16GB chip this is the
    difference between fitting and OOM (frozen ViT-L + DINO-L + decoder
    are ~750M params that would otherwise carry 2x f32 moments).
    """

    def mark(path, leaf):
        names = {getattr(p, "key", None) for p in path}
        return bool(names & set(trainable_modules))

    return jax.tree_util.tree_map_with_path(mark, params)


def cast_frozen_params(params, trainable_modules=("panoptic_decoder",),
                       dtype=jnp.bfloat16) -> Any:
    """Store frozen submodule params in bf16 (halves their HBM footprint);
    trainable params stay f32 for the optimizer."""

    def cast(path, leaf):
        names = {getattr(p, "key", None) for p in path}
        if names & set(trainable_modules):
            return leaf
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, params)


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


def build_optimizer(config: TrainConfig, world_size: int,
                    steps_per_epoch: int, trainable_mask=None):
    """steps_per_epoch counts MICRO-batches (train-step calls).

    Under ``optax.MultiSteps`` the inner schedule's counter increments once
    per optimizer *update* (every accum_iter micro-steps), so the schedule
    is built over updates-per-epoch; the returned logging schedule maps
    micro-step counts (``state.step``) back onto the same curve.
    """
    updates_per_epoch = max(steps_per_epoch // max(config.accum_iter, 1), 1)
    schedule = cosine_lr(config, world_size, updates_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(config.clip_grad)
        if config.clip_grad else optax.identity(),
        optax.scale_by_adam(b1=config.betas[0], b2=config.betas[1]),
        optax.masked(optax.add_decayed_weights(config.weight_decay),
                     _decay_mask),
        optax.scale_by_learning_rate(schedule),
    )
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    if config.accum_iter > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.accum_iter)

    def log_schedule(micro_step):
        return schedule(micro_step // max(config.accum_iter, 1))

    return tx, log_schedule


def make_train_step(model, tx, loss_config: PanopticLossConfig,
                    grid: tuple[int, int], donate: bool = True,
                    amp: Optional[str] = None, train_mask: Any = None):
    """Build the jitted train step.

    batch: dict with images (B, V, H, W, 3), portrait (B, V),
    targets: Targets pytree, cls_embeddings (ncls, D).
    amp='bf16': the torch-autocast analog (reference engine/train.py:37-40)
    — images enter as bf16, so the frozen bf16-cast towers (encoder,
    memory decoder, DINOv2) run fully in bf16 activations; trainable
    (f32-master-weight) modules promote back to f32 at their first layer,
    and the criterion math stays f32.  Matmul precision is lowered to
    bf16 as well.
    train_mask: optional pytree of bools (see ``trainable_mask``) — frozen
    leaves enter the forward as constants, so no backward pass is built
    through frozen submodules at all (the torch requires_grad=False
    semantics, reference train.py:219-222).  Without it, autodiff
    linearizes — and the chip executes — a full backward through ~750M
    frozen encoder/decoder/DINO params whose gradients the masked
    optimizer then throws away.
    """
    precision = "bfloat16" if amp == "bf16" else None

    def step_fn(state: TrainState, batch: dict, cls_embeddings, key):
        def loss_fn(diff_params):
            params = diff_params
            if train_mask is not None:
                params = jax.tree_util.tree_map(
                    lambda m, t, f: t if m else f,
                    train_mask, diff_params, state.params)
            ctx = (jax.default_matmul_precision(precision)
                   if precision else _nullcontext())
            images = batch["images"]
            if amp == "bf16":
                images = images.astype(jnp.bfloat16)
            with ctx:
                panout, _ = model.apply(params, images,
                                        batch["portrait"], cls_embeddings,
                                        grid)
            total, details = panoptic_loss(
                key, panout, batch["targets"], loss_config)
            return total, details

        (loss, details), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if train_mask is not None:
            # Frozen params alias straight through instead of riding
            # `apply_updates` (p + 0): the full-tree add read+wrote all
            # 876M params every step — measured 29.7 ms of the 78 ms
            # flagship step, pure HBM traffic for parameters that never
            # change (tools/train_step_bench.py TSB_BREAKDOWN, r5).
            params = jax.tree_util.tree_map(
                lambda m, p, u: optax.apply_updates(p, u) if m else p,
                train_mask, state.params, updates)
        else:
            params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1)
        return new_state, loss, details

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def shard_batch(batch: dict, mesh) -> dict:
    """Place the batch with its leading axis sharded over ``data``.

    Single-process: a plain device_put with a NamedSharding.  Multi-process
    (multi-host): each process holds only ITS slice of the global batch
    (data/loader.py rank sharding), so the global array is assembled from
    process-local shards — the jitted step then computes the GLOBAL loss
    (no separate cross-rank loss all-reduce needed, unlike the reference's
    DDP+all_reduce_mean, engine/train.py:138)."""
    multiproc = jax.process_count() > 1

    def put(x):
        sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def step_arg_specs(state: TrainState, cls_embeddings, mesh,
                   batch_size: int, num_views: int, max_instances: int,
                   ncls: int, hw: tuple[int, int]):
    """(state, batch, cls, key) ShapeDtypeStructs matching a real
    ``train_one_epoch`` call at resolution ``hw`` EXACTLY.

    Shardings must reproduce the real call or the lowered HLO differs
    and the persistent cache misses: batch leaves get ``shard_batch``'s
    NamedSharding over DATA_AXIS; state/cls leaves keep explicit mesh
    placements (e.g. tensor-parallel params from core/tp.apply_tp) but
    uncommitted single-device leaves stay UNANNOTATED (sharding=None) —
    the real call lowers them without sdy.sharding attrs, and any
    explicit annotation (even mesh-replicated) changes the HLO text
    (verified by lowered-text diff, test_train.py).
    """
    def arr_spec(a):
        shard = (a.sharding if isinstance(a, jax.Array)
                 and isinstance(a.sharding, NamedSharding) else None)
        return jax.ShapeDtypeStruct(jnp.shape(a), a.dtype, sharding=shard)

    H, W = hw
    B, V, T = batch_size, num_views, max_instances

    def sharded(shape, dtype):
        s = NamedSharding(mesh, P(DATA_AXIS, *([None] * (len(shape) - 1))))
        return jax.ShapeDtypeStruct(shape, dtype, sharding=s)

    batch = {
        "images": sharded((B, V, H, W, 3), jnp.float32),
        "portrait": sharded((B, V), jnp.bool_),
        "targets": Targets(
            labels=sharded((B, T), jnp.int32),
            masks=sharded((B, T, V, H, W), jnp.float32),
            valid=sharded((B, T), jnp.bool_),
            output_mask=sharded((B, ncls), jnp.bool_)),
    }
    state_spec = jax.tree_util.tree_map(arr_spec, state)
    return (state_spec, batch, arr_spec(jnp.asarray(cls_embeddings)),
            arr_spec(jax.random.PRNGKey(0)))


def precompile_step_fns(step_fns: dict, state: TrainState, cls_embeddings,
                        mesh, batch_size: int, num_views: int,
                        max_instances: int, ncls: int,
                        workers: Optional[int] = None) -> float:
    """AOT-compile every resolution bucket's train step CONCURRENTLY.

    The reference pays no per-resolution compile (eager torch); here each
    bucket is one XLA program at ~40-50 s backend time, so a 5-bucket
    recipe serializes minutes of compile into the first epoch.  XLA
    compilation is C++ and releases the GIL, so lowering each bucket's
    step to its exact (shape, dtype, sharding) signature
    (``step_arg_specs``) and compiling in a thread pool overlaps the
    backend work; with the persistent compilation cache enabled the real
    first step per bucket then deserializes instead of compiling.
    Tracing (python) stays serial.

    Returns wall seconds spent.
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    # Trace/lower serially (python-bound), compile concurrently.
    lowered = {hw: fn.lower(*step_arg_specs(state, cls_embeddings, mesh,
                                            batch_size, num_views,
                                            max_instances, ncls, hw))
               for hw, fn in step_fns.items()}
    with ThreadPoolExecutor(workers or len(lowered)) as pool:
        futures = {hw: pool.submit(lo.compile)
                   for hw, lo in lowered.items()}
        for hw, fut in futures.items():
            fut.result()
    return time.time() - t0


def train_one_epoch(state: TrainState, step_fn, data_iter, cls_embeddings,
                    mesh, epoch: int, seed: int, log_writer=None,
                    print_freq: int = 20, steps_per_epoch: int = 0,
                    schedule=None, sync_every: int = 1):
    """Host-side epoch loop (reference engine/train.py:59-154).

    ``step_fn`` is either a single jitted step or a dict keyed by the batch
    image shape (H, W) — one compiled step per resolution bucket (the
    reference's multi-resolution recipe, configs/base.yaml:46).

    ``sync_every``: fetch the loss scalar every N steps instead of every
    step.  jax dispatch is async — a per-step ``float(loss)`` inserts a
    host↔device round-trip between steps (measured 33 ms/step on a
    tunneled host link, 1.5x the whole device step; a few µs on PCIe),
    while the device happily queues ahead.  With N > 1 the NaN abort
    (reference :118-120) still fires, at most N-1 steps late — the
    reference's per-step ``.item()`` has the same semantics under CUDA's
    async queue, just a cheaper sync.  Losses are still recorded for
    every step.
    """
    key = jax.random.fold_in(jax.random.PRNGKey(seed), epoch)
    losses = []
    pending: list = []          # device loss scalars awaiting fetch

    def drain():
        for dev_loss in pending:
            loss_value = float(dev_loss)
            if not math.isfinite(loss_value):
                raise FloatingPointError(
                    f"Loss is {loss_value}, stopping training")  # :118-120
            losses.append(loss_value)
        pending.clear()

    for it, batch in enumerate(data_iter):
        fn = step_fn
        if isinstance(step_fn, dict):
            fn = step_fn[tuple(batch["images"].shape[2:4])]
        batch = shard_batch(batch, mesh)
        state, loss, details = fn(state, batch, cls_embeddings,
                                  jax.random.fold_in(key, it))
        pending.append(loss)
        if len(pending) >= max(sync_every, 1):
            drain()

        if log_writer is not None and (it + 1) % print_freq == 0:
            drain()
            epoch_f = epoch + it / max(steps_per_epoch, 1)
            vals = {"train/loss": float(np.mean(losses[-print_freq:])),
                    "train/iter": epoch_f}
            if schedule is not None:
                vals["train/lr"] = float(schedule(int(state.step)))
            for k, v in details.items():
                vals[f"train/{k}"] = float(v)
            log_writer.log(vals, epoch_f)

    drain()
    return state, {"loss": float(np.mean(losses)) if losses else 0.0}
