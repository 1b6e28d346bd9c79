"""Input-pipeline throughput: does the loader feed the chip? (VERDICT r4 #6)

Builds a realistic 2-dataset mix (synthetic ScanNet++-layout roots with
real JPEG/PNG decode + Lanczos crop/resize + ColorJitter augmentation at
source resolution 640x480), then measures `epoch_batches(workers=N)` +
`prefetch` in samples/s against the measured device step rates
(PERFORMANCE.md r4: 0.109 s/step pipelined at the 384 bucket, B=1 V=3 →
9.2 samples/s; 0.081 at 256 → 12.3).  Bar: loader ≥ 1.2× step rate.

Run: python tools/loader_bench.py [--samples 64] [--views 3]
(CPU only; JAX not imported.)
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def make_root(root, n_scenes, n_views, hw=(480, 640)):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    from test_data import _make_scannetpp

    _make_scannetpp(root, n_scenes=n_scenes, n_views=n_views, hw=hw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=64,
                    help="samples to time per config")
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--hw", default="480x640")
    args = ap.parse_args()

    from panst3r_tpu.apps.train import (DatasetSpec, ExperimentConfig,
                                        build_datasets)
    from panst3r_tpu.data.loader import epoch_batches, prefetch

    sh, sw = map(int, args.hw.split("x"))
    roots = []
    for i in range(2):
        d = tempfile.mkdtemp(prefix=f"loaderbench{i}_")
        make_root(d, n_scenes=args.scenes, n_views=10, hw=(sh, sw))
        roots.append(d)

    exp = ExperimentConfig(
        datasets=(DatasetSpec(root=roots[0], ds_size=400),
                  DatasetSpec(root=roots[1], ds_size=200)),
        resolution=((512, 384), (512, 256)),
        num_views=args.views, aug_crop=16,
        transform="ColorJitter")
    ds = build_datasets(exp)
    classes = sorted(set(ds.classes))
    print(f"mix: {len(ds)} tuples/epoch, {args.views} views/sample, "
          f"source {sw}x{sh}, decode+Lanczos+jitter per view")

    n_batches = max(2, args.samples // args.batch)
    results = {}
    for mode, workers in (("thread", 0), ("thread", 4),
                          ("process", 2), ("process", 4), ("process", 8)):
        it = epoch_batches(ds, args.batch, classes, max_instances=32,
                           epoch=0, num_resolutions=2, workers=workers,
                           workers_mode=mode)
        it = prefetch(it, depth=2)
        next(it)                      # warm (pool spin-up, caches)
        t0 = time.perf_counter()
        n = 0
        for b, batch in enumerate(it):
            n += batch["images"].shape[0]
            if b + 1 >= n_batches:
                break
        dt = time.perf_counter() - t0
        rate = n / dt
        results[(mode, workers)] = rate
        print(f"{mode:7s} workers={workers}: {rate:6.2f} samples/s "
              f"({rate * args.views:6.1f} views/s)")

    step_384, step_256 = 1 / 0.109, 1 / 0.081
    best = max(results.values())
    print(f"\ndevice step rate (B=1 V=3 pipelined): "
          f"{step_384:.1f} samples/s @384, {step_256:.1f} @256")
    print(f"loader best / step rate: {best / step_384:.2f}x @384, "
          f"{best / step_256:.2f}x @256  (bar: >= 1.2x)")


if __name__ == "__main__":
    main()
