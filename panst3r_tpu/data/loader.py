"""Batch collation: view dicts → static-shape training batches.

Replaces the reference's torch DataLoader + DistributedSampler path
(must3r build_dataset, /root/reference/train.py:162-164) with a simple
deterministic host-side loader: per-epoch shuffling, per-rank sharding by
slicing, landscape canonicalization (core/bucketing.py) and padded target
preparation (data/targets.py).  Output batches are numpy pytrees ready for
`shard_batch` (engine/train.py).
"""
from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np

from panst3r_tpu.data.targets import prepare_targets
from panst3r_tpu.engine.criterion import Targets


def canonicalize_views(views: Sequence[dict]) -> dict:
    """Stack one sample's views; transpose portrait views to landscape.

    Returns images (V, H, W, 3), portrait (V,), pan_inst_id/pan_cls_id
    (V, H, W) — all landscape-canonical.
    """
    imgs, portraits, insts, clss = [], [], [], []
    for v in views:
        img = v["img"]
        inst = v["pan_inst_id"]
        cls = v["pan_cls_id"]
        portrait = img.shape[0] > img.shape[1]
        if portrait:
            img = np.swapaxes(img, 0, 1)
            inst = np.swapaxes(inst, 0, 1)
            cls = np.swapaxes(cls, 0, 1)
        imgs.append(img)
        insts.append(inst)
        clss.append(cls)
        portraits.append(portrait)
    return {
        "images": np.stack(imgs),
        "portrait": np.asarray(portraits, bool),
        "pan_inst_id": np.stack(insts),
        "pan_cls_id": np.stack(clss),
        "class_set": views[0]["class_set"],
        # Scene-level crowd instance ids (panopticapi iscrowd eval rules).
        "crowd_inst_ids": np.asarray(
            views[0].get("crowd_inst_ids", np.zeros(0, np.int64))),
    }


def collate_batch(samples: Sequence[Sequence[dict]], classes: list[str],
                  max_instances: int) -> dict:
    """samples: list of per-sample view lists (same bucket) → batch dict."""
    canon = [canonicalize_views(v) for v in samples]
    images = np.stack([c["images"] for c in canon])
    portrait = np.stack([c["portrait"] for c in canon])

    tgt = [prepare_targets(c["pan_inst_id"], c["pan_cls_id"],
                           c["class_set"].split(";"), classes, max_instances)
           for c in canon]
    targets = Targets(
        labels=np.stack([t["labels"] for t in tgt]),
        masks=np.stack([t["masks"] for t in tgt]),
        valid=np.stack([t["valid"] for t in tgt]),
        output_mask=np.stack([t["output_mask"] for t in tgt]),
    )
    return {"images": images.astype(np.float32), "portrait": portrait,
            "targets": targets}


# Spawn-worker state: each worker process unpickles the dataset once at
# pool start (initargs), then serves (idx, res) keys from it — the torch
# DataLoader model (reference train.py:162-164) without per-task dataset
# pickling.
_WORKER_DATASET = None


def _process_worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    try:                    # cv2 spins an internal pool per process —
        import cv2          # one thread each or N workers oversubscribe
        cv2.setNumThreads(0)
    except ImportError:     # pragma: no cover
        pass


def _process_worker_get(key):
    return _WORKER_DATASET[key]


def epoch_batches(dataset, batch_size: int, classes: list[str],
                  max_instances: int, epoch: int, seed: int = 777,
                  rank: int = 0, world_size: int = 1,
                  num_resolutions: int = 1,
                  workers: int = 0,
                  workers_mode: str = "process") -> Iterator[dict]:
    """Deterministic per-epoch iterator with rank sharding.

    All samples of one batch share a resolution bucket (drawn per batch) so
    shapes stay static per compiled executable — the reference gets the
    same effect by sampling `resolution` once per __getitem__ tuple.

    ``workers`` > 0 loads samples through a pool — the analog of torch
    DataLoader's `num_workers` (reference train.py:162-164).  Batch order
    and contents are identical regardless of ``workers``.
    ``workers_mode="process"`` (default) uses spawn-based worker
    processes: the decode/augment path is mostly GIL-bound numpy, so
    threads plateau at ~1.5x regardless of count (measured,
    PERFORMANCE.md r5) while processes scale with cores — the same
    reason torch's DataLoader forks.  ``"thread"`` keeps the in-process
    pool (no pickling; useful for unpicklable datasets or debugging).
    Sample futures are pipelined ``2*workers`` ahead across batch
    boundaries so small batch sizes still fill every worker.
    """
    dataset.set_epoch(epoch)
    rng = np.random.default_rng(seed + epoch)
    order = rng.permutation(len(dataset))
    order = order[rank::world_size]
    n_batches = len(order) // batch_size
    batch_keys = []
    for b in range(n_batches):
        idxs = order[b * batch_size:(b + 1) * batch_size]
        res_idx = int(rng.integers(num_resolutions))
        batch_keys.append([(int(i), res_idx) for i in idxs])

    if workers <= 0:
        for keys in batch_keys:
            yield collate_batch([dataset[k] for k in keys], classes,
                                max_instances)
        return

    if workers_mode == "process":
        import multiprocessing as mp
        import os
        import sys

        # spawn re-imports __main__ in the child; a REPL / stdin / -c
        # parent has no importable main and every worker dies at start.
        main_mod = sys.modules.get("__main__")
        main_file = getattr(main_mod, "__file__", None)
        if main_file is not None and not os.path.exists(main_file):
            main_file = None
        if main_file is None and getattr(main_mod, "__spec__", None) is None:
            workers_mode = "thread"

    if workers_mode == "process":
        # spawn, not fork: the parent is multi-threaded (prefetch,
        # dispatch) and typically has an XLA client up — forking either
        # is a lock-state lottery.  Children import numpy/cv2/PIL only.
        pool = ProcessPoolExecutor(
            workers, mp_context=mp.get_context("spawn"),
            initializer=_process_worker_init, initargs=(dataset,))
        submit = lambda key: pool.submit(_process_worker_get, key)  # noqa: E731
    elif workers_mode == "thread":
        pool = ThreadPoolExecutor(workers)
        submit = lambda key: pool.submit(dataset.__getitem__, key)  # noqa: E731
    else:
        raise ValueError(f"workers_mode={workers_mode!r}")

    try:
        inflight = max(2 * workers, 2 * batch_size)
        pending: collections.deque = collections.deque()
        n_submitted = 0
        bi = 0
        while bi < len(batch_keys) or pending:
            while bi < len(batch_keys) and n_submitted < inflight:
                pending.append([submit(k) for k in batch_keys[bi]])
                n_submitted += len(batch_keys[bi])
                bi += 1
            futs = pending.popleft()
            samples = [f.result() for f in futs]
            n_submitted -= len(futs)
            yield collate_batch(samples, classes, max_instances)
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


def prefetch(batches: Iterator[dict], depth: int = 2) -> Iterator[dict]:
    """Run a batch iterator in a background thread, keeping up to ``depth``
    batches ready — host-side loading overlaps the device step (the
    pipelining torch DataLoader workers provide in the reference).
    Exceptions from the producer re-raise at the consumer."""
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    done = object()
    err = object()          # identity sentinels: item values never collide

    def producer():
        try:
            for item in batches:
                q.put(item)
            q.put(done)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            q.put((err, e))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is err:
            raise item[1]
        yield item
