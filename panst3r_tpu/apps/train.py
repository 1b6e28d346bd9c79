"""Training CLI.

Equivalent of /root/reference/train.py (Hydra main, :110-302) on the
declarative config system: YAML config → dataclasses (never eval'd
strings), auto-resume from `<output_dir>/last`, per-epoch checkpointing
with `keep_freq` numbered keeps, logger selection, vocab setup.

Run:  python -m panst3r_tpu.apps.train --config configs/train_v1.yaml \
          [--output-dir out] [--epochs N] ...
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.core import config as cfglib
from panst3r_tpu.core.checkpoint import (latest_checkpoint, load_checkpoint,
                                         save_checkpoint)
from panst3r_tpu.core.logging import build_logger
from panst3r_tpu.core.mesh import MeshSpec, build_mesh
from panst3r_tpu.engine.train import (TrainConfig, TrainState,
                                      build_optimizer, cast_frozen_params,
                                      make_train_step, train_one_epoch,
                                      trainable_mask)
from panst3r_tpu.data.loader import epoch_batches, prefetch
from panst3r_tpu.data.scannetpp import ScanNetppPanoptic
from panst3r_tpu.models.panst3r import PanSt3R
from panst3r_tpu.models.presets import (panst3r_v1_config, panst3r_v2_config,
                                        tiny_config)
from panst3r_tpu.models.text_encoder import TextEncoder, TextEncoderConfig


@cfglib.register
@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """One term of the training dataset mix — the declarative form of the
    reference's eval'd algebra strings ``N @ Dataset(...) + M @ Dataset``
    (/root/reference/configs/base.yaml:30,45; train.py:162-164).
    ``ds_size`` > 0 resamples the dataset to that many tuples per epoch
    (``N @ A``, data/base.ResizedDataset); ``repeat`` > 1 repeats it
    (``N * A``).  Per-spec overrides default to the experiment-level
    values when unset."""
    type: str = "scannetpp"
    root: str = ""
    ds_size: int = 0
    repeat: int = 1
    aug_crop: int = -1                     # -1 → experiment aug_crop
    transform: str | None = None
    # num_views stays experiment-global: every sample of a batch must have
    # the same view count for the static-shape bucket steps.


@cfglib.register
@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model_preset: str = "v1"               # v1 | v2 | tiny
    data_root: str = ""
    # Dataset mix (reference base.yaml:30: the dataset field is a LIST with
    # ds_size resizing).  Empty → single ScanNetppPanoptic at data_root.
    datasets: tuple = ()
    resolution: tuple = ((512, 384),)
    num_views: int = 5
    aug_crop: int = 16
    # Reference recipe parity (configs/base.yaml:38-48): photometric
    # augmentation + randomized per-sample memory-core size.
    transform: str | None = None           # None | "ColorJitter"
    min_memory_num_views: int | None = None
    max_memory_num_views: int | None = None
    train: TrainConfig = TrainConfig()
    output_dir: str = "./out"
    keep_freq: int = 10                    # reference base.yaml:81
    print_freq: int = 20
    # Loss-fetch cadence (engine/train.train_one_epoch sync_every): 1 =
    # reference per-step semantics; >1 pipelines dispatch on slow host
    # links (NaN abort fires at most N-1 steps late).
    sync_every: int = 1
    logger: str = "tensorboard"
    mesh_data: int = -1
    mesh_mem: int = 1
    mesh_model: int = 1   # tensor parallelism (core/tp.py)
    # Host data pipeline: per-batch sample-decode thread pool + background
    # batch prefetch (the reference's DataLoader num_workers analog).
    loader_workers: int = 4
    # "process" (default): spawn worker processes — the decode/augment
    # path is GIL-bound numpy, so threads plateau; "thread" for
    # unpicklable datasets or debugging (see data/loader.epoch_batches).
    loader_workers_mode: str = "process"
    loader_prefetch: int = 2
    text_encoder: str = "siglip"
    # PQ eval cadence (the reference's train.py:290 eval is a TODO; here it
    # runs the real inference+fusion+PQ pipeline on held-out scenes).
    eval_every: int = 0
    eval_scenes: int = 8
    eval_keyframes: int = 4
    # Concurrent AOT compile of all resolution buckets before epoch 0
    # (engine/train.precompile_step_fns) — the 5-bucket reference recipe
    # otherwise serializes ~40-50 s of XLA backend time per bucket into
    # the first epoch's first steps.
    precompile: bool = True
    compilation_cache: str | None = ".jax_cache"


def build_model(preset: str) -> PanSt3R:
    cfg = {"v1": panst3r_v1_config, "v2": panst3r_v2_config,
           "tiny": tiny_config}[preset]()
    return PanSt3R(cfg)


DATASET_TYPES = {"scannetpp": ScanNetppPanoptic}


def build_datasets(exp: "ExperimentConfig"):
    """Experiment dataset mix → one algebra dataset (reference
    train.py:162-164 ``build_dataset(eval(args.dataset))``, minus the
    eval).  Each spec becomes ``repeat * (ds_size @ Dataset(...))`` and
    the terms concatenate; per-dataset vocabularies stay intact per
    sample (class_set → per-sample output_mask in the criterion,
    reference criterion/panoptic.py:158)."""
    specs = [DatasetSpec(**s) if isinstance(s, dict) else s
             for s in exp.datasets]
    if not specs:
        specs = [DatasetSpec(root=exp.data_root)]
    terms = []
    for spec in specs:
        cls = DATASET_TYPES[spec.type]
        ds = cls(spec.root or exp.data_root,
                 resolution=list(exp.resolution),
                 num_views=exp.num_views,
                 aug_crop=exp.aug_crop if spec.aug_crop < 0 else spec.aug_crop,
                 transform=spec.transform or exp.transform,
                 min_memory_num_views=exp.min_memory_num_views,
                 max_memory_num_views=exp.max_memory_num_views)
        if spec.ds_size:
            ds = spec.ds_size @ ds
        if spec.repeat > 1:
            ds = spec.repeat * ds
        terms.append(ds)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--output-dir", type=str, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--data-root", type=str, default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    if args.config:
        exp: ExperimentConfig = cfglib.load_yaml(args.config)
    else:
        exp = ExperimentConfig()
    if args.output_dir:
        exp = dataclasses.replace(exp, output_dir=args.output_dir)
    if args.data_root:
        exp = dataclasses.replace(exp, data_root=args.data_root)
    if args.epochs:
        exp = dataclasses.replace(
            exp, train=dataclasses.replace(exp.train, epochs=args.epochs))

    out_dir = Path(exp.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfglib.save_yaml(exp, out_dir / "config.yaml")

    # Persistent compilation cache: per-bucket step compiles (~40-50 s
    # XLA each) become one-time costs across runs, and the concurrent
    # precompile below hands its executables to the first real steps
    # through this cache.
    if exp.compilation_cache:
        cache = Path(exp.compilation_cache).expanduser()
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from panst3r_tpu.core import distributed as dist

    dist.initialize()  # no-op single-host (reference init_distributed_mode)
    mesh = build_mesh(MeshSpec(data=exp.mesh_data, mem=exp.mesh_mem,
                               model=exp.mesh_model))
    world = mesh.devices.size
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"host {dist.process_index()}/{dist.process_count()}")

    dataset = build_datasets(exp)
    classes = sorted(set(dataset.classes))

    model = build_model(exp.model_preset)
    # One patch grid per resolution bucket (reference trains on a list of
    # 512×H buckets, base.yaml:46); resolutions are (W, H) with W >= H
    # (landscape-canonical).  grid keyed by the batch image shape (H, W).
    grids = {(h, w): (h // 16, w // 16) for (w, h) in exp.resolution}
    grid = next(iter(grids.values()))

    # Text vocabulary → fixed embedding table (reference train.py:185-189).
    # The model's lang_dim must match the tower's embed dim; when it doesn't
    # (tiny/test presets) or the tower is unavailable (no local HF weights /
    # text_encoder='random'), fall back to random unit embeddings.
    lang_dim = model.config.panoptic.mask_transformer.lang_dim
    cls_emb = None
    if exp.text_encoder != "random":
        text = TextEncoder(TextEncoderConfig(model_name=exp.text_encoder))
        if text.embed_dim == lang_dim:
            try:
                text.set_vocab(classes)
                cls_emb = jnp.asarray(text(classes))
            except Exception as e:
                print(f"WARN: text tower unavailable ({e}); "
                      "using random embeddings")
    if cls_emb is None:
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((len(classes), lang_dim))
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        cls_emb = jnp.asarray(emb.astype(np.float32))

    H, W = exp.resolution[0][1], exp.resolution[0][0]
    V = exp.num_views
    init_batch = jnp.zeros((1, V, H, W, 3), jnp.float32)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(exp.train.seed), init_batch,
        jnp.zeros((1, V), bool), cls_emb, grid)

    # Freeze policy → optimizer masking + bf16 frozen params
    # (reference train.py:219-222; see engine/train.trainable_mask).
    mc = model.config
    trainable = ["panoptic_decoder"]
    if not mc.freeze_encoder:
        trainable.append("must3r_encoder")
    if not mc.freeze_decoder:
        trainable.append("must3r_decoder")
    params = cast_frozen_params(params, tuple(trainable))

    from panst3r_tpu.core.mesh import MODEL_AXIS
    if mesh.shape[MODEL_AXIS] > 1:   # covers mesh_model=-1 ("remaining")
        # Tensor parallelism: split weights over the model axis (core/tp.py);
        # GSPMD propagates to activations and inserts the per-block
        # all-reduces inside the jitted steps below.
        from panst3r_tpu.core.tp import apply_tp
        with mesh:
            params = apply_tp(params, mesh)

    steps_per_epoch = max(len(dataset) // (exp.train.batch_size * world), 1)
    tx, schedule = build_optimizer(
        exp.train, world, steps_per_epoch,
        trainable_mask=trainable_mask(params, tuple(trainable)))
    state = TrainState.create(params, tx)
    # One compiled step per bucket, routed by batch image shape — the
    # static-shape analog of the reference's per-sample multi-resolution
    # batches (batched_map / utils.py:90-196).
    tmask = trainable_mask(params, tuple(trainable))
    step_fns = {hw: make_train_step(model, tx, exp.train.loss, g,
                                    amp=exp.train.amp, train_mask=tmask)
                for hw, g in grids.items()}
    if exp.precompile and len(step_fns) > 1:
        # The AOT executables reach the real first steps THROUGH the
        # persistent compilation cache (lower().compile() does not prime
        # jit dispatch by itself — measured); without the cache the
        # precompile would pay full compile time twice.
        if exp.compilation_cache:
            from panst3r_tpu.engine.train import precompile_step_fns
            with mesh:
                dt = precompile_step_fns(
                    step_fns, state, cls_emb, mesh, exp.train.batch_size,
                    V, exp.train.max_instances, cls_emb.shape[0])
            print(f"precompiled {len(step_fns)} bucket steps in {dt:.0f}s")
        else:
            print("precompile skipped: compilation_cache is disabled "
                  "(the AOT executables would be recompiled anyway)")

    start_epoch = 0
    last = latest_checkpoint(out_dir) if True else None
    if last:  # auto-resume (reference train.py:149-151,253-254)
        # Abstract restore template (shape/dtype/sharding) — np.asarray
        # on the live tree would crash on globally-sharded arrays in
        # multi-host runs ("spans non-addressable devices"); orbax
        # restores each leaf straight onto its sharding.
        abstract = jax.tree_util.tree_map(
            lambda a: (jax.ShapeDtypeStruct(a.shape, a.dtype,
                                            sharding=a.sharding)
                       if isinstance(a, jax.Array) else a), state)
        tree, _, meta = load_checkpoint(out_dir, last, abstract)
        state = tree
        start_epoch = int(meta.get("epoch", -1)) + 1
        print(f"resumed from epoch {start_epoch}")

    log_writer = build_logger(exp.logger, out_dir)

    print(f"Start training for {exp.train.epochs} epochs")
    t0 = time.time()
    for epoch in range(start_epoch, exp.train.epochs):
        batches = epoch_batches(dataset, exp.train.batch_size, classes,
                                exp.train.max_instances, epoch,
                                seed=exp.train.seed,
                                rank=dist.process_index(),
                                world_size=dist.process_count(),
                                num_resolutions=len(exp.resolution),
                                workers=exp.loader_workers,
                                workers_mode=exp.loader_workers_mode)
        if exp.loader_prefetch > 0:
            batches = prefetch(batches, exp.loader_prefetch)
        with mesh:
            state, stats = train_one_epoch(
                state, step_fns, batches, cls_emb, mesh, epoch,
                exp.train.seed, log_writer, exp.print_freq,
                steps_per_epoch, schedule, sync_every=exp.sync_every)

        if exp.eval_every and epoch % exp.eval_every == 0 \
                and dist.is_main_process():
            from collections import defaultdict

            from panst3r_tpu.apps.eval import evaluate_scene
            from panst3r_tpu.core.bucketing import Bucket
            from panst3r_tpu.engine.eval import PQStat, summarize
            from panst3r_tpu.engine.inference import InferenceEngine

            engine = InferenceEngine(
                model, state.params, Bucket(H, W),
                num_keyframes=exp.eval_keyframes, amp=False)
            per_class = defaultdict(PQStat)
            n_eval = min(exp.eval_scenes, len(dataset))
            for i in range(len(dataset) - n_eval, len(dataset)):
                evaluate_scene(engine, dataset[i], classes,
                               np.asarray(cls_emb, np.float32),
                               per_class=per_class)
            pq = summarize(per_class)
            print(f"[eval epoch {epoch}] {pq}")
            log_writer.log({f"eval/{k}": v for k, v in pq.items()
                            if isinstance(v, (int, float))}, epoch)
            stats = {**stats, **{f"eval_{k}": v for k, v in pq.items()}}

        meta = {"epoch": epoch, "stats": stats, "classes": classes,
                # class-embedding table: serving (apps/demo, apps/serve)
                # must pair trained weights with the SAME text embeddings
                "cls_emb": np.asarray(cls_emb, np.float32)}
        # The (possibly globally-sharded) device tree goes to orbax
        # directly — every process participates, shards written in place
        # (a host np.asarray copy is not even addressable for
        # globally-sharded arrays on >1 process).
        save_checkpoint(out_dir, "last", state, model.config, meta)
        if exp.keep_freq and epoch % exp.keep_freq == 0:
            save_checkpoint(out_dir, str(epoch), state, model.config,
                            meta)
        if dist.is_main_process():   # reference save_on_master analog
            with (out_dir / "log.txt").open("a") as f:
                f.write(json.dumps({"epoch": epoch,
                                    **{f"train_{k}": v
                                       for k, v in stats.items()}}) + "\n")

    print(f"Training time {time.time() - t0:.1f}s")
    # final checkpoint without optimizer state (reference io.py:44-57)
    save_checkpoint(out_dir, "final", state.params, model.config,
                    {"epoch": exp.train.epochs, "classes": classes,
                     "cls_emb": np.asarray(cls_emb, np.float32)})


if __name__ == "__main__":
    main()
