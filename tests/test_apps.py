"""App-level smoke tests: demo reconstruction/export, eval driver."""
import json
import os

import numpy as np
import pytest

from panst3r_tpu.apps.demo import (export_scene, load_images,
                                   panoptic_overlay, reconstruct_scene,
                                   segment_colors, write_ply)
from panst3r_tpu.core.bucketing import Bucket
from panst3r_tpu.engine.inference import InferenceEngine

from tests.test_data import _make_scannetpp
from tests.test_inference import _setup
from tests.test_train import GRID, H, NCLS, W


def test_segment_colors_unique():
    cols = segment_colors(10)
    assert cols.shape == (10, 3)
    assert len({tuple(c) for c in cols}) == 10


def test_load_images(tmp_path, rng):
    from PIL import Image

    for i, size in enumerate([(640, 480), (480, 640)]):  # land + portrait
        Image.fromarray((rng.random((size[1], size[0], 3)) * 255)
                        .astype(np.uint8)).save(tmp_path / f"{i}.jpg")
    imgs, portrait, bucket = load_images(
        sorted(str(p) for p in tmp_path.iterdir()))
    assert imgs.shape[0] == 2
    assert imgs.shape[1] <= imgs.shape[2]          # landscape canonical
    assert portrait.tolist() == [False, True]
    assert -1.01 <= imgs.min() and imgs.max() <= 1.01


def test_reconstruct_and_export(tmp_path, rng):
    model, params, images, portrait, cls_emb = _setup(rng, V=4)
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=2,
                             chunk=2, amp=False)
    classes = [f"c{i}" for i in range(NCLS)]
    scene = reconstruct_scene(engine, images, portrait, classes, cls_emb,
                              num_keyframes=2)
    assert scene["pan"].shape == (4, H, W)
    assert scene["focals"].shape == (4,)
    assert scene["cams2world"].shape == (4, 4, 4)

    export_scene(tmp_path, images, scene, conf_threshold=0.0)
    assert (tmp_path / "scene.ply").exists()
    assert (tmp_path / "panoptic_000.png").exists()
    meta = json.loads((tmp_path / "cameras.json").read_text())
    assert len(meta["focals"]) == 4
    assert meta["image_size"] == [H, W]
    # one 3D medoid label per exported segment, finite positions
    assert len(meta["labels"]) == len(meta["segments_info"])
    for lab in meta["labels"]:
        assert len(lab["pos"]) == 3
        assert all(np.isfinite(lab["pos"]))
    header = (tmp_path / "scene.ply").read_text().splitlines()[:3]
    assert header[0] == "ply"


def test_eval_driver_on_synthetic(tmp_path, rng):
    from panst3r_tpu.apps.eval import evaluate_scene
    from panst3r_tpu.data.scannetpp import ScanNetppPanoptic
    from panst3r_tpu.engine.eval import summarize

    _make_scannetpp(str(tmp_path), n_views=4, hw=(H, W))
    ds = ScanNetppPanoptic(str(tmp_path), resolution=(W, H), num_views=3,
                           aug_crop=0)
    model, params, _, _, _ = _setup(rng, V=3)
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=3,
                             chunk=3, amp=False)
    classes = sorted(set(ds.classes))
    cls_emb = rng.standard_normal((len(classes), 24)).astype(np.float32)

    per_class = evaluate_scene(engine, ds[0], classes, cls_emb)
    s = summarize(per_class)
    assert set(s) >= {"PQ", "SQ", "RQ"}
    assert 0.0 <= s["PQ"] <= 100.0


def test_serving_daemon_end_to_end(rng):
    """POST a scene to the serving daemon; response equals the direct
    serve_device + unpack path."""
    import io
    import threading
    import urllib.request

    from panst3r_tpu.apps.serve import SceneServer, make_server
    from tests.test_serve import _engine as _serve_engine
    from tests.test_serve import _scene as _serve_scene
    from tests.test_serve import H as SH, V as SV, W as SW

    eng = _serve_engine(rng)
    images, portrait, cls_emb = _serve_scene(rng)
    srv = make_server(SceneServer(eng, cls_emb), "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert r.read() == b"ok"

        buf = io.BytesIO()
        np.savez(buf, images=images, portrait=portrait)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct?cameras=1",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            out = np.load(io.BytesIO(r.read()))

        ref = eng.unpack_wire(np.asarray(eng.serve_device(
            images, portrait, cls_emb, with_cameras=True)), SV,
            with_cameras=True)
        assert out["pan"].shape == (SV, SH, SW)
        np.testing.assert_array_equal(out["pan"], ref["pan"])
        np.testing.assert_allclose(out["cam2world"], ref["cam2world"])

        # malformed request → 400, server stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct", data=b"junk",
            method="POST")
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert r.read() == b"ok"
    finally:
        srv.shutdown()


def test_serving_daemon_slam_stream(rng):
    """Stream frames through the daemon SLAM endpoints; keyframes promote,
    pointmaps return per frame, finish yields refined poses."""
    import io
    import threading
    import urllib.request

    from panst3r_tpu.apps.serve import SceneServer, make_server
    from tests.test_serve import _engine as _serve_engine
    from tests.test_serve import H as SH, W as SW

    eng = _serve_engine(rng)
    srv = make_server(SceneServer(eng, np.zeros((6, 24), np.float32)),
                      "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def post(path, **arrays):
        buf = io.BytesIO()
        np.savez(buf, **arrays) if arrays else None
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=buf.getvalue() if arrays else b"", method="POST")
        with urllib.request.urlopen(req) as r:
            body = r.read()
        return np.load(io.BytesIO(body)) if body[:2] == b"PK" else body

    try:
        assert post("/slam/start?max_interval=2") == b"ok"
        n_kf = 0
        for i in range(5):
            img = (rng.random((SH, SW, 3)) * 2 - 1).astype(np.float32)
            out = post("/slam/frame", image=img)
            n_kf += int(out["is_keyframe"])
            if "pts3d" in out:
                assert out["pts3d"].shape == (SH, SW, 3)
        assert n_kf >= 2
        fin = post("/slam/finish")
        # all 5 frames get poses: frame 0 (bootstrap) is re-rendered
        # against the final memory at finish, like the CLI path
        assert fin["poses"].shape == (5, 4, 4)
        assert fin["frame_ids"].tolist() == [0, 1, 2, 3, 4]
        assert fin["keyframe_ids"][0] == 0
        np.testing.assert_allclose(fin["poses"][:, 3], [[0, 0, 0, 1]] * 5,
                                   atol=1e-6)
        # finishing again without a session → 400
        import urllib.error
        try:
            post("/slam/finish")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
