"""Reconstruction demo: images → panoptic 3D point cloud.

Equivalent of the reference demo pipeline (/root/reference/tools/
demo_panst3r.py `get_reconstructed_scene`, :187-303 + gradio/viser UI):
load images → bucket-resize → inference engine → panoptic fusion → focal +
pose recovery → colored point-cloud export.

The web UI stack (gradio + viser) is optional and not baked into this
image; the core pipeline is UI-independent and exports:
  - scene.ply          — point cloud colored by RGB ⊕ panoptic overlay
  - panoptic_<i>.png   — per-view segment overlays
  - cameras.json       — per-view focal + cam2world + segments_info

Run:  python -m panst3r_tpu.apps.demo --images dir/ --out out_scene/
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
from PIL import Image

from panst3r_tpu.core.bucketing import (DEFAULT_BUCKETS, bucket_for_shape,
                                        transpose_to_landscape)
from panst3r_tpu.engine.fusion import panoptic_fusion, qubo_fusion
from panst3r_tpu.engine.pose import geotrf, recover_cameras

# ScanNet-style class set (reference demo CLASS_NAMES scannet subset,
# tools/demo_panst3r.py:54-58).
SCANNET_CLASSES = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "other furniture", "ceiling",
]


def load_images(paths: list[str], bucket=None):
    """PIL load → landscape canonical → common bucket resize → dust3r norm."""
    raws = []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        img, portrait = transpose_to_landscape(img)
        raws.append((img, bool(portrait)))
    if bucket is None:
        h, w = raws[0][0].shape[:2]
        bucket = bucket_for_shape(h, w, DEFAULT_BUCKETS)
    imgs, portraits = [], []
    for img, portrait in raws:
        pil = Image.fromarray(img).resize((bucket.width, bucket.height),
                                          Image.LANCZOS)
        imgs.append(np.asarray(pil, np.float32) / 255.0 * 2.0 - 1.0)
        portraits.append(portrait)
    return np.stack(imgs), np.asarray(portraits), bucket


def segment_colors(n: int, seed: int = 0) -> np.ndarray:
    """Grid-sampled RGB colors (reference utils.py get_colors_grid :76-87)."""
    N = int(np.ceil((n + 1) ** (1 / 3)))
    coords = np.linspace(0, 1, max(N, 2))
    r, g, b = np.meshgrid(coords, coords, coords)
    colors = np.c_[r.ravel(), g.ravel(), b.ravel()][1:]
    np.random.default_rng(seed).shuffle(colors)
    return (colors[:n] * 255).astype(np.uint8)


def panoptic_overlay(rgb: np.ndarray, pan: np.ndarray, colors: np.ndarray,
                     alpha: float = 0.5) -> np.ndarray:
    """rgb: (H, W, 3) uint8; pan: (H, W) segment ids (0 = void)."""
    out = rgb.astype(np.float32)
    seg_rgb = np.zeros_like(out)
    mask = pan > 0
    seg_rgb[mask] = colors[(pan[mask] - 1) % len(colors)]
    out[mask] = out[mask] * (1 - alpha) + seg_rgb[mask] * alpha
    return out.astype(np.uint8)


def write_ply(path: str | Path, points: np.ndarray, colors: np.ndarray):
    """Minimal binary-less PLY writer (no trimesh dependency)."""
    points = points.reshape(-1, 3)
    colors = colors.reshape(-1, 3).astype(np.uint8)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(points)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for (x, y, z), (r, g, b) in zip(points, colors):
            f.write(f"{x:.4f} {y:.4f} {z:.4f} {r} {g} {b}\n")


def reconstruct_scene(engine, images: np.ndarray, portrait: np.ndarray,
                      classes: list[str], cls_emb: np.ndarray,
                      fusion: str = "standard_v2", num_keyframes=None,
                      conf_threshold: float = 1.5) -> dict:
    """Full demo pipeline on a prepared image stack."""
    import jax.numpy as jnp

    out = engine.run(images, portrait, cls_emb, num_keyframes=num_keyframes)
    H, W = images.shape[1:3]
    fuse = qubo_fusion if fusion == "qubo" else panoptic_fusion
    pan = fuse(jnp.asarray(out["pred_logits"][None]),
               jnp.asarray(out["pred_masks"][None]), (H, W))[0]
    for seg in pan["segments_info"]:
        seg["category_name"] = classes[seg["category_id"]]

    focals, cams2world = recover_cameras(
        {k: jnp.asarray(v) for k, v in out["pointmaps"].items()}, (H, W))
    return {
        "pointmaps": out["pointmaps"],
        "pan": np.asarray(pan["pan"]),
        "segments_info": pan["segments_info"],
        "conf": np.asarray(pan["conf"]),
        "focals": np.asarray(focals),
        "cams2world": np.asarray(cams2world),
        "keyframes": out["keyframes"],
    }


def export_scene(out_dir: str | Path, images: np.ndarray, scene: dict,
                 conf_threshold: float = 1.5, alpha: float = 0.5,
                 max_points: int = 500_000):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    V, H, W = scene["pan"].shape

    rgb = ((images * 0.5 + 0.5) * 255).astype(np.uint8)
    n_segs = max([s["id"] for s in scene["segments_info"]], default=0)
    colors = segment_colors(max(n_segs, 1))

    for i in range(V):
        ov = panoptic_overlay(rgb[i], scene["pan"][i], colors, alpha)
        Image.fromarray(ov).save(out_dir / f"panoptic_{i:03d}.png")

    pts = scene["pointmaps"]["pts3d"].reshape(-1, 3)
    conf = scene["pointmaps"]["conf"].reshape(-1)
    base = rgb.reshape(-1, 3).astype(np.float32)
    pan_flat = scene["pan"].reshape(-1)
    seg_col = np.zeros_like(base)
    m = pan_flat > 0
    seg_col[m] = colors[(pan_flat[m] - 1) % len(colors)]
    blend = np.where(m[:, None], base * (1 - alpha) + seg_col * alpha, base)

    keep = conf > conf_threshold
    if keep.sum() > max_points:
        idx = np.random.default_rng(0).choice(np.nonzero(keep)[0],
                                              max_points, replace=False)
        keep = np.zeros_like(keep)
        keep[idx] = True
    write_ply(out_dir / "scene.ply", pts[keep], blend[keep])

    # 3D labels at segment medoids (reference ViserVisualizer,
    # demo_panst3r.py:622-687): medoid computed on a ≤512-point subsample
    # of each segment's confident points.
    rng_l = np.random.default_rng(0)
    labels = []
    for seg in scene["segments_info"]:
        m = (pan_flat == seg["id"]) & (conf > conf_threshold)
        if not m.any():
            m = pan_flat == seg["id"]
        if not m.any():
            continue
        p = pts[m]
        if len(p) > 512:
            p = p[rng_l.choice(len(p), 512, replace=False)]
        d = np.linalg.norm(p[:, None] - p[None], axis=-1).sum(1)
        labels.append({
            "id": int(seg["id"]),
            "name": seg.get("category_name", str(seg["category_id"])),
            "pos": [float(v) for v in p[int(d.argmin())]],
        })

    meta = {
        "focals": scene["focals"].tolist(),
        "cams2world": scene["cams2world"].tolist(),
        "segments_info": scene["segments_info"],
        "keyframes": scene["keyframes"],
        "image_size": [int(H), int(W)],
        "labels": labels,
    }
    (out_dir / "cameras.json").write_text(json.dumps(meta, indent=2))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="directory of images or file list")
    ap.add_argument("--out", default="./demo_out")
    ap.add_argument("--preset", default="v1",
                    choices=["v1", "v2", "tiny", "tiny_v2"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num-keyframes", type=int, default=16)
    ap.add_argument("--fusion", default="standard_v2",
                    choices=["standard_v1", "standard_v2", "qubo"])
    args = ap.parse_args(argv)

    p = Path(args.images)
    paths = sorted(str(f) for f in p.iterdir()
                   if f.suffix.lower() in (".jpg", ".jpeg", ".png")) \
        if p.is_dir() else [s for s in p.read_text().splitlines() if s]
    images, portrait, bucket = load_images(paths)

    from panst3r_tpu.apps.common import build_engine

    engine, classes, cls_emb = build_engine(
        args.preset, bucket, checkpoint=args.checkpoint,
        num_keyframes=args.num_keyframes, classes=SCANNET_CLASSES)
    scene = reconstruct_scene(engine, images, portrait, classes, cls_emb,
                              fusion=args.fusion,
                              num_keyframes=args.num_keyframes)
    export_scene(args.out, images, scene)
    print(f"exported {args.out}/scene.ply + overlays "
          f"({len(scene['segments_info'])} segments)")


if __name__ == "__main__":
    main()
