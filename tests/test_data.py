"""Data pipeline tests: cropping math, dataset algebra, synthetic ScanNet++."""
import json
import os

import numpy as np
import pytest

from panst3r_tpu.data.base import (CatDataset, EasyDataset, MulDataset,
                                   ResizedDataset, select_tuple_from_pairs)
from panst3r_tpu.data.cropping import (camera_matrix_of_crop,
                                       crop_resize_if_necessary)
from panst3r_tpu.data.loader import collate_batch, epoch_batches
from panst3r_tpu.data.utils import id2rgb


class FakeDataset(EasyDataset):
    def __init__(self, n, tag):
        self.n, self.tag = n, tag

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            idx = idx[0]
        return (self.tag, idx)

    @property
    def classes(self):
        return [self.tag]


def test_dataset_algebra():
    a, b = FakeDataset(3, "a"), FakeDataset(2, "b")
    cat = a + b
    assert len(cat) == 5
    assert cat[4] == ("b", 1)
    assert sorted(cat.classes) == ["a", "b"]

    mul = 3 * a
    assert len(mul) == 9
    assert mul[7] == ("a", 2)

    res = 10 @ a
    assert len(res) == 10
    res.set_epoch(1)
    items = [res[i] for i in range(10)]
    assert all(t == "a" for t, _ in items)


def test_select_tuple_from_pairs():
    pairs = {0: {1, 2}, 1: {0}, 2: {0, 3}, 3: {2}}
    rng = np.random.default_rng(0)
    views = select_tuple_from_pairs(lambda v: pairs[v],
                                    lambda v, r: v, 4, 4, rng, 0, 1)
    assert len(views) == 4
    assert views[:2] == [0, 1]
    assert set(views) <= {0, 1, 2, 3}


def test_select_tuple_memory_core_semantics():
    """min/max_memory_num_views (reference configs/base.yaml:38-41): the
    first M views form a connected memory core; every later view must be
    covisible with the MEMORY core, not merely with another late view."""
    # star around 0-1 core; 4 and 5 only reachable through 3
    pairs = {0: {1, 2, 3}, 1: {0, 2}, 2: {0, 1}, 3: {0, 4, 5},
             4: {3}, 5: {3}}
    for seed in range(10):
        rng = np.random.default_rng(seed)
        views = select_tuple_from_pairs(lambda v: pairs[v],
                                        lambda v, r: v, 5, 2, rng, 0, 1)
        mem = set(views[:2])
        assert mem == {0, 1}
        for v in views[2:]:
            # covisible with the memory core (or a fallback repeat)
            assert (pairs[v] & mem) or v in (0, 1), (views, v)
        # 4/5 are NOT neighbors of the {0,1} memory core
        assert 4 not in views[2:] and 5 not in views[2:]


def test_dataset_memory_num_views_sampling(tmp_path):
    root = str(tmp_path / "snpp")
    _make_scannetpp(root, n_views=6)
    from panst3r_tpu.data.scannetpp import ScanNetppPanoptic

    ds = ScanNetppPanoptic(root, resolution=(64, 48), num_views=4,
                           aug_crop=0, seed=3, min_memory_num_views=2,
                           max_memory_num_views=4)
    seen = set()
    for i in range(min(8, len(ds))):
        views = ds[i]
        ms = {v["memory_num_views"] for v in views}
        assert len(ms) == 1                  # consistent within a tuple
        m = ms.pop()
        assert 2 <= m <= 4
        seen.add(m)
    assert len(seen) > 1                     # actually randomized


def test_crop_resize_landscape(rng):
    img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
    depth = rng.random((480, 640)).astype(np.float32)
    inst = rng.integers(0, 5, (480, 640)).astype(np.int32)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    image, (d2, i2), K2 = crop_resize_if_necessary(
        img, (depth, inst), K, (512, 384), rng=rng, aug_crop=0)
    assert image.size == (512, 384)
    assert d2.shape == (384, 512)
    assert i2.shape == (384, 512)
    assert set(np.unique(i2)) <= set(np.unique(inst))  # NEAREST preserves ids
    # principal point stays centered-ish
    assert abs(K2[0, 2] - 256) < 2 and abs(K2[1, 2] - 192) < 2


def _make_scannetpp(root, n_scenes=1, n_views=4, hw=(64, 96),
                    class_names=("wall", "chair")):
    import cv2

    H, W = hw
    scenes, sceneids, images_l, intrinsics, trajectories, pairs = \
        [], [], [], [], [], []
    rng = np.random.default_rng(0)
    vid = 0
    for s in range(n_scenes):
        scene = f"scene{s:04d}"
        scenes.append(scene)
        for sub in ("images", "depth", "panoptic"):
            os.makedirs(os.path.join(root, scene, sub), exist_ok=True)
        first = vid
        for v in range(n_views):
            name = f"frame{v:03d}"
            img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(root, scene, "images", name + ".jpg"),
                        img)
            depth = (rng.random((H, W)) * 3000).astype(np.uint16)
            cv2.imwrite(os.path.join(root, scene, "depth", name + ".png"),
                        depth)
            pan = np.zeros((H, W), np.int64)
            pan[8:24, 8:40] = 1 * 256 + 0      # inst 1, cls 0
            pan[30:50, 50:90] = 2 * 256 + 1    # inst 2, cls 1
            pan_rgb = id2rgb(pan)
            cv2.imwrite(os.path.join(root, scene, "panoptic", name + ".png"),
                        cv2.cvtColor(pan_rgb, cv2.COLOR_RGB2BGR))
            images_l.append(name)
            sceneids.append(s)
            intrinsics.append([[80.0, 0, W / 2], [0, 80.0, H / 2],
                               [0, 0, 1]])
            trajectories.append(np.eye(4))
            vid += 1
        for v in range(n_views - 1):
            pairs.append([first + v, first + v + 1, 0.8])
    np.savez(os.path.join(root, "all_metadata.npz"),
             scenes=np.asarray(scenes), sceneids=np.asarray(sceneids),
             images=np.asarray(images_l),
             intrinsics=np.asarray(intrinsics, np.float32),
             trajectories=np.asarray(trajectories, np.float32),
             pairs=np.asarray(pairs), cls_sep=256)
    cats = [{"id": i, "name": c} for i, c in enumerate(class_names)]
    with open(os.path.join(root, "categories.json"), "w") as f:
        json.dump(cats, f)


def test_scannetpp_dataset(tmp_path, rng):
    from panst3r_tpu.data.scannetpp import ScanNetppPanoptic

    _make_scannetpp(str(tmp_path))
    ds = ScanNetppPanoptic(str(tmp_path), resolution=(64, 48), num_views=3,
                           aug_crop=0)
    assert ds.classes == ["wall", "chair"]
    views = ds[0]
    assert len(views) == 3
    v = views[0]
    assert v["img"].shape[-1] == 3
    assert v["img"].min() >= -1.001 and v["img"].max() <= 1.001
    assert v["pan_inst_id"].shape == v["img"].shape[:2]
    assert set(np.unique(v["pan_inst_id"])) <= {0, 1, 2}

    batch = collate_batch([ds[0], ds[1]], ds.classes, max_instances=8)
    assert batch["images"].shape[:2] == (2, 3)
    assert batch["targets"].labels.shape == (2, 8)
    assert batch["targets"].valid.sum() >= 2

    batches = list(epoch_batches(ds, 2, ds.classes, 8, epoch=0))
    assert len(batches) == len(ds) // 2
    assert batches[0]["images"].dtype == np.float32


def test_loader_workers_and_prefetch_parity(tmp_path, rng):
    """workers/prefetch must not change batch order or contents, and
    producer exceptions must re-raise at the consumer."""
    from panst3r_tpu.data.loader import prefetch
    from panst3r_tpu.data.scannetpp import ScanNetppPanoptic

    _make_scannetpp(str(tmp_path))
    ds = ScanNetppPanoptic(str(tmp_path), resolution=(64, 48), num_views=2,
                           aug_crop=0)
    ref = list(epoch_batches(ds, 2, ds.classes, 8, epoch=1))
    for mode in ("thread", "process"):
        got = list(prefetch(epoch_batches(ds, 2, ds.classes, 8, epoch=1,
                                          workers=3, workers_mode=mode),
                            depth=2))
        assert len(ref) == len(got)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a["images"], b["images"])
            np.testing.assert_array_equal(a["targets"].labels,
                                          b["targets"].labels)
            np.testing.assert_array_equal(a["targets"].masks,
                                          b["targets"].masks)

    def boom():
        yield ref[0]
        raise RuntimeError("loader failure")

    it = prefetch(boom(), depth=1)
    next(it)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="loader failure"):
        next(it)
