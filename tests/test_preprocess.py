"""End-to-end preprocessing test: synthetic raw scene → preprocessed dataset
loadable by ScanNetppPanoptic."""
import json
import os
import os.path as osp
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))

import preprocess_scannetpp as pp  # noqa: E402


def _write_ply_binary(path, verts, faces):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        verts.astype("<f4").tofile(f)
        for tri in faces:
            f.write(struct.pack("<B3i", 3, *tri))


def _make_raw_scene(root, scene="s0"):
    sdir = osp.join(root, "data", scene)
    os.makedirs(osp.join(sdir, "scans"))
    os.makedirs(osp.join(sdir, "dslr", "colmap"))
    os.makedirs(osp.join(sdir, "dslr", "resized_images"))

    # A big quad at z=3 (wall) + small quad at z=2 (chair), world frame.
    verts = np.array([
        [-3, -3, 3], [3, -3, 3], [3, 3, 3], [-3, 3, 3],       # wall
        [-0.5, -0.5, 2], [0.5, -0.5, 2], [0.5, 0.5, 2], [-0.5, 0.5, 2],
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    _write_ply_binary(osp.join(sdir, "scans", "mesh_aligned_0.05.ply"),
                      verts, faces)

    json.dump({"segIndices": list(range(8))},
              open(osp.join(sdir, "scans", "segments.json"), "w"))
    json.dump({"segGroups": [
        {"label": "wall", "segments": [0, 1, 2, 3]},
        {"label": "chair", "segments": [4, 5, 6, 7]},
        {"label": "unknownthing", "segments": []},
    ]}, open(osp.join(sdir, "scans", "segments_anno.json"), "w"))

    # COLMAP: one PINHOLE-ish OPENCV camera, two identity-pose images.
    W, H = 128, 96
    with open(osp.join(sdir, "dslr", "colmap", "cameras.txt"), "w") as f:
        f.write("# h\n# h\n# h\n")
        f.write(f"1 OPENCV {W} {H} 60 60 64 48 0 0 0 0\n")
    with open(osp.join(sdir, "dslr", "colmap", "images.txt"), "w") as f:
        f.write("# header\n")
        for i, name in enumerate(["DSC0001.JPG", "DSC0002.JPG"]):
            f.write(f"{i + 1} 1 0 0 0 0 0 0 1 {name}\n")
            f.write("\n")

    import cv2
    rng = np.random.default_rng(0)
    for name in ["DSC0001.JPG", "DSC0002.JPG"]:
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(osp.join(sdir, "dslr", "resized_images", name), img)

    pairs_dir = osp.join(root, "pairs", scene)
    os.makedirs(pairs_dir)
    np.savez(osp.join(pairs_dir, "selected_pairs.npz"),
             selection=np.asarray(["DSC0001", "DSC0002"]),
             pairs=np.asarray([[0, 1, 0.9]]))
    return root


def test_ply_roundtrip(tmp_path):
    verts = np.arange(12, dtype=np.float32).reshape(4, 3)
    faces = np.array([[0, 1, 2], [1, 2, 3]], np.int32)
    _write_ply_binary(tmp_path / "m.ply", verts, faces)
    v, f = pp.load_ply_mesh(str(tmp_path / "m.ply"))
    np.testing.assert_allclose(v, verts)
    np.testing.assert_array_equal(f, faces)


def test_pose_from_qwxyz_txyz():
    c2w = pp.pose_from_qwxyz_txyz([1, 0, 0, 0, 1.0, 2.0, 3.0])
    np.testing.assert_allclose(c2w[:3, :3], np.eye(3), atol=1e-9)
    np.testing.assert_allclose(c2w[:3, 3], [-1, -2, -3], atol=1e-9)


def test_full_preprocess_then_load(tmp_path):
    root = _make_raw_scene(str(tmp_path))
    out_dir = str(tmp_path / "out")
    classes_file = tmp_path / "classes.txt"
    classes_file.write_text("wall\nchair\n")

    pp.main(["--root", root, "--pairs-dir", osp.join(root, "pairs"),
             "--output-dir", out_dir, "--class-list", str(classes_file),
             "--target-resolution", "128", "96"])

    assert osp.exists(osp.join(out_dir, "all_metadata.npz"))
    assert osp.exists(osp.join(out_dir, "categories.json"))

    import cv2
    from panst3r_tpu.data.utils import rgb2id

    pan_png = cv2.imread(osp.join(out_dir, "s0", "panoptic", "DSC0001.png"))
    pan = rgb2id(cv2.cvtColor(pan_png, cv2.COLOR_BGR2RGB))
    inst = pan // 256
    cls = pan % 256
    # chair (inst 2, cls 1) occludes wall (inst 1, cls 0) at center
    assert inst[48, 64] == 2 and cls[48, 64] == 1
    assert inst[10, 10] == 1 and cls[10, 10] == 0

    depth = cv2.imread(osp.join(out_dir, "s0", "depth", "DSC0001.png"),
                       cv2.IMREAD_UNCHANGED)
    assert abs(int(depth[48, 64]) - 2000) < 50   # chair at 2 m
    assert abs(int(depth[10, 10]) - 3000) < 50   # wall at 3 m

    # The preprocessed output is directly loadable by the dataset class.
    from panst3r_tpu.data.scannetpp import ScanNetppPanoptic

    ds = ScanNetppPanoptic(out_dir, resolution=(64, 48), num_views=2,
                           aug_crop=0)
    views = ds[0]
    assert len(views) == 2
    assert set(np.unique(views[0]["pan_inst_id"])) <= {0, 1, 2}
