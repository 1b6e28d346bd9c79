"""Benchmark eval adapters: hypersim / replica / scannet rendered-test-image
scenes (the published PQ protocol).

The reference reports PQ for "direct multi-view prediction on the rendered
test images (without LUDVIG)" (/root/reference/README.md:124-129) but ships
NO eval code (train.py:290 is a TODO).  These adapters define the scene
reader feeding engine/eval.py's PQ harness so the published table
(hypersim 56.5 / replica 62.0 / scannet 65.7 for v1; 59.6 / 61.8 / 63.0
for v2) can be reproduced the moment ported weights + the benchmark scenes
are on disk.

Scene layout (auto-detected per scene directory):

  <root>/<scene>/
      color|rgb|images/          *.jpg|*.png   rendered test views
      one of:
        panoptic/                *.png   combined map: rgb2id →
                                          inst = id // cls_sep,
                                          cls = id % cls_sep  (our
                                          preprocess_scannetpp format)
        semantic|semantic_class/ *.png   per-pixel class id
        + instance|semantic_instance/ *.png  per-pixel instance id
  <root>/categories.json   [{"id": int, "name": str}, ...]  (or pass
                            ``classes=`` explicitly)

Views are bucket-resized exactly like training data (Lanczos for RGB,
NEAREST joint for the id maps — data/cropping.py), so PQ is measured at
the bucket resolution on both prediction and GT.
"""
from __future__ import annotations

import json
import os.path as osp
from glob import glob
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from panst3r_tpu.data.cropping import crop_resize_if_necessary
from panst3r_tpu.data.utils import rgb2id

CLS_SEP = 256

_IMG_DIRS = ("color", "rgb", "images")
_SEM_DIRS = ("semantic", "semantics", "semantic_class", "sem")
_INST_DIRS = ("instance", "instances", "semantic_instance", "inst")
_PAN_DIRS = ("panoptic", "pan")

# Reference class-set names (tools/demo_panst3r.py:54-58) — the benchmark
# scenes are evaluated against one of these vocabularies.
BENCHMARK_CLASS_SET = {"hypersim": "scannet", "replica": "scannet",
                       "scannet": "scannet", "scannetpp": "scannet"}


def _find_dir(scene_dir: str, candidates: Sequence[str]) -> Optional[str]:
    for c in candidates:
        d = osp.join(scene_dir, c)
        if osp.isdir(d):
            return d
    return None


def _frames(d: str) -> list[str]:
    fs = sorted(glob(osp.join(d, "*.jpg")) + glob(osp.join(d, "*.png"))
                + glob(osp.join(d, "*.jpeg")))
    return fs


def _read_id_map(path: str, combined: bool) -> np.ndarray:
    img = np.asarray(Image.open(path))
    if combined:
        assert img.ndim == 3, f"panoptic map must be RGB (id2rgb): {path}"
        return rgb2id(img).astype(np.int64)
    if img.ndim == 3:                       # id stored in RGB channels
        return rgb2id(img).astype(np.int64)
    return img.astype(np.int64)


class BenchmarkScenes:
    """Iterator of rendered-test scenes for PQ eval.

    Each item is a list of view dicts with the loader contract of
    data/scannetpp.py (img in dust3r [-1,1], pan_inst_id / pan_cls_id,
    class_set) so `apps/eval.evaluate_scene` consumes it unchanged.
    """

    def __init__(self, root: str, benchmark: str = "scannet",
                 resolution=(512, 384), num_views: Optional[int] = None,
                 classes: Optional[Sequence[str]] = None,
                 cls_sep: int = CLS_SEP):
        self.root = root
        self.benchmark = benchmark
        self.resolution = tuple(resolution)
        self.num_views = num_views
        self.cls_sep = cls_sep
        self.scenes = sorted(
            d for d in glob(osp.join(root, "*")) if osp.isdir(d))
        if not self.scenes:
            raise FileNotFoundError(f"no scene directories under {root}")

        if classes is not None:
            self.classes = list(classes)
        else:
            cat_path = osp.join(root, "categories.json")
            with open(cat_path) as f:
                cats = json.load(f)
            by_id = {int(c["id"]): c["name"] for c in cats}
            self.classes = [by_id.get(i, f"class_{i}")
                            for i in range(max(by_id) + 1)]

    def __len__(self) -> int:
        return len(self.scenes)

    def _scene_frames(self, scene_dir: str):
        img_dir = _find_dir(scene_dir, _IMG_DIRS)
        assert img_dir, f"no image dir in {scene_dir} (tried {_IMG_DIRS})"
        pan_dir = _find_dir(scene_dir, _PAN_DIRS)
        sem_dir = _find_dir(scene_dir, _SEM_DIRS)
        inst_dir = _find_dir(scene_dir, _INST_DIRS)
        assert pan_dir or (sem_dir and inst_dir), (
            f"{scene_dir}: need panoptic/ or semantic/+instance/ maps")
        return img_dir, pan_dir, sem_dir, inst_dir

    def __getitem__(self, idx: int) -> list[dict]:
        scene_dir = self.scenes[idx]
        img_dir, pan_dir, sem_dir, inst_dir = self._scene_frames(scene_dir)
        frames = _frames(img_dir)
        if self.num_views is not None:
            sel = np.linspace(0, len(frames) - 1, min(self.num_views,
                                                      len(frames)))
            frames = [frames[int(i)] for i in sel.round()]

        views = []
        for f in frames:
            stem = osp.splitext(osp.basename(f))[0]

            def gt_path(d):
                cands = glob(osp.join(d, stem + ".*"))
                assert cands, f"no GT map for {stem} in {d}"
                return cands[0]

            if pan_dir:
                pan = _read_id_map(gt_path(pan_dir), combined=True)
                inst = pan // self.cls_sep
                cls = pan % self.cls_sep
            else:
                cls = _read_id_map(gt_path(sem_dir), combined=False)
                inst = _read_id_map(gt_path(inst_dir), combined=False)

            image = Image.open(f).convert("RGB")
            # centered crop+resize to the bucket (image-center principal
            # point; the protocol evaluates rendered images with no
            # intrinsics metadata).
            W0, H0 = image.size
            K = np.asarray([[1.0, 0, W0 / 2], [0, 1.0, H0 / 2], [0, 0, 1]],
                           np.float32)
            image, (inst, cls), _ = crop_resize_if_necessary(
                image, [inst, cls], K, self.resolution,
                rng=np.random.default_rng(0), aug_crop=0)
            img = np.asarray(image, np.float32) / 127.5 - 1.0
            views.append({
                "img": img,
                "pan_inst_id": np.asarray(inst, np.int64),
                "pan_cls_id": np.asarray(cls, np.int64),
                "class_set": ";".join(self.classes),
            })
        return views


# Published reference PQ (README.md:128-129) for vs_reference reporting.
REFERENCE_PQ = {
    ("v1", "hypersim"): 56.5, ("v1", "replica"): 62.0,
    ("v1", "scannet"): 65.7,
    ("v2", "hypersim"): 59.6, ("v2", "replica"): 61.8,
    ("v2", "scannet"): 63.0,
}
