"""Benchmark eval adapters: rendered-test-scene reader + eval CLI e2e."""
import json

import numpy as np
import pytest
from PIL import Image

from panst3r_tpu.data.utils import id2rgb


def _make_benchmark_root(root, combined: bool, n_scenes=2, n_views=3,
                         hw=(40, 56)):
    """Synthesize the rendered-test-image layout (both GT formats)."""
    H, W = hw
    rng = np.random.default_rng(0)
    cats = [{"id": i, "name": n} for i, n in
            enumerate(["void", "wall", "chair", "table"])]
    (root / "categories.json").write_text(json.dumps(cats))
    for s in range(n_scenes):
        scene = root / f"scene{s:02d}"
        (scene / "color").mkdir(parents=True)
        inst = np.zeros((H, W), np.int64)
        cls = np.zeros((H, W), np.int64)
        inst[5:20, 8:30] = 1
        cls[5:20, 8:30] = 2
        inst[25:38, 20:50] = 2
        cls[25:38, 20:50] = 3
        for v in range(n_views):
            img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(scene / "color" / f"{v:04d}.jpg")
            if combined:
                (scene / "panoptic").mkdir(exist_ok=True)
                pan = inst * 256 + cls
                Image.fromarray(id2rgb(pan)).save(
                    scene / "panoptic" / f"{v:04d}.png")
            else:
                (scene / "semantic").mkdir(exist_ok=True)
                (scene / "instance").mkdir(exist_ok=True)
                Image.fromarray(cls.astype(np.uint8)).save(
                    scene / "semantic" / f"{v:04d}.png")
                Image.fromarray(inst.astype(np.uint8)).save(
                    scene / "instance" / f"{v:04d}.png")
    return root


@pytest.mark.parametrize("combined", [True, False])
def test_benchmark_scene_reader(tmp_path, combined):
    from panst3r_tpu.data.benchmarks import BenchmarkScenes

    _make_benchmark_root(tmp_path, combined)
    ds = BenchmarkScenes(str(tmp_path), "replica", resolution=(48, 32),
                         num_views=2)
    assert len(ds) == 2
    assert ds.classes == ["void", "wall", "chair", "table"]
    views = ds[0]
    assert len(views) == 2
    v = views[0]
    assert v["img"].shape == (32, 48, 3)
    assert v["img"].min() >= -1.0 and v["img"].max() <= 1.0
    assert v["pan_inst_id"].shape == (32, 48)
    assert set(np.unique(v["pan_inst_id"])) <= {0, 1, 2}
    assert set(np.unique(v["pan_cls_id"])) <= {0, 2, 3}
    # instance/class maps stay consistent after the joint NEAREST resize
    assert (v["pan_cls_id"][v["pan_inst_id"] == 1] == 2).all()


def test_eval_cli_benchmark_protocol(tmp_path):
    """apps/eval.py --benchmark replica end-to-end on the tiny preset:
    produces a PQ summary with the reference comparison fields."""
    from panst3r_tpu.apps import eval as eval_app

    _make_benchmark_root(tmp_path, combined=True)
    result = eval_app.main([
        "--data-root", str(tmp_path), "--benchmark", "replica",
        "--preset", "tiny", "--num-scenes", "1", "--num-views", "2",
        "--num-keyframes", "2", "--resolution", "48", "32",
    ])
    assert "PQ" in result and np.isfinite(result["PQ"])
    assert result["reference_pq"] == 62.0
    assert "vs_reference" in result


def test_fps_dist_thresh():
    from panst3r_tpu.engine.retrieval import farthest_point_sampling

    # 4 points on a line: 0 --- 1 -- 2 ------- 3
    pos = np.asarray([0.0, 1.0, 1.5, 5.0])
    dist = np.abs(pos[:, None] - pos[None])
    full = farthest_point_sampling(dist, 4)
    assert len(full) == 4 and full[0] == 0 and full[1] == 3
    # threshold 1.0: stops once all remaining are within 1.0
    capped = farthest_point_sampling(dist, 4, dist_thresh=1.0)
    assert len(capped) < 4
    rest = [i for i in range(4) if i not in capped]
    assert all(dist[i][capped].min() < 1.0 for i in rest)
