"""CLI end-to-end smoke tests (tiny preset, CPU)."""
import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def image_dir(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"frame_{i:03d}.jpg")
    return d


def test_demo_cli(image_dir, tmp_path):
    from panst3r_tpu.apps import demo

    out = tmp_path / "demo_out"
    demo.main(["--images", str(image_dir), "--out", str(out),
               "--preset", "tiny", "--num-keyframes", "2"])
    assert (out / "scene.ply").exists()
    assert (out / "cameras.json").exists()
    meta = json.loads((out / "cameras.json").read_text())
    assert len(meta["focals"]) == 4


def test_slam_cli(image_dir, tmp_path):
    from panst3r_tpu.apps import slam

    out = tmp_path / "slam_out"
    slam.main(["--images", str(image_dir), "--out", str(out),
               "--preset", "tiny", "--max-interval", "1",
               "--sim-threshold", "2.0"])
    assert (out / "trajectory.npz").exists()
    data = np.load(out / "trajectory.npz")
    assert data["poses"].shape == (4, 4, 4)
    meta = json.loads((out / "slam.json").read_text())
    assert meta["num_frames"] == 4


def test_viewer_serves_scene(tmp_path):
    import threading
    import urllib.request

    from panst3r_tpu.apps.demo import write_ply
    from panst3r_tpu.apps.viewer import _Handler

    import functools
    import http.server

    write_ply(tmp_path / "scene.ply", np.zeros((10, 3), np.float32),
              np.full((10, 3), 128, np.uint8))
    handler = functools.partial(_Handler, scene_dir=tmp_path)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/").read().decode()
        assert "panst3r_tpu viewer" in html
        ply = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/scene.ply").read().decode()
        assert ply.startswith("ply")
    finally:
        srv.shutdown()
