"""Online SLAM demo: sequential frames → trajectory + keyframes + map.

The north-star usage mode (BASELINE.json): instead of the reference's
offline all-keyframes batch (panst3r.py:169-284), frames stream through the
incremental frontend (O(1) memory-conditioned decode + keyframe insertion)
and the pose-graph backend refines keyframe poses at the end.

Run:  python -m panst3r_tpu.apps.slam --images frames_dir/ --out slam_out/
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def run_slam(engine, images: np.ndarray, sim_threshold: float = 0.9,
             max_interval: int = 5, refine: bool = True,
             ba: bool = False, ba_voxel: float = 0.05,
             ba_stride: int = 8) -> dict:
    """images: (N, H, W, 3) canonical frames in order."""
    import jax.numpy as jnp

    from panst3r_tpu.engine.slam import (IncrementalFrontend,
                                         refine_scene_poses)
    from panst3r_tpu.models.decoder import postprocess

    frontend = IncrementalFrontend(engine, sim_threshold=sim_threshold,
                                   max_interval=max_interval)
    raw = []
    keyframes = []
    for i, img in enumerate(images):
        out = frontend.process(img, i)
        if out["is_keyframe"]:
            keyframes.append(i)
        raw.append(out["pointmaps_raw"])

    # Frame 0 has no pointmaps until the memory bootstraps; re-render it.
    if raw[0] is None:
        x, pos = engine._encode_all(images[:1])
        pm, _ = engine._render(engine.params, x[None], pos[None],
                               frontend.state.mem)
        raw[0] = np.asarray(pm[0, 0])

    pm_stack = jnp.asarray(np.stack(raw), jnp.float32)
    post = postprocess(pm_stack)
    pointmaps = {k: np.asarray(v, np.float32) for k, v in post.items()}

    result = {"pointmaps": pointmaps, "keyframes": keyframes}
    if refine:
        refined, init, costs = refine_scene_poses(pointmaps)
        result["poses_init"] = np.asarray(init)
        result["poses"] = np.asarray(refined)
        result["gn_costs"] = np.asarray(costs).tolist()
        if ba:
            # Global structure refinement: pointmap-anchored BA on top of
            # the pose-graph solution (engine/ba.py).
            from panst3r_tpu.engine.ba import refine_scene_ba

            ba_poses, ba_costs = refine_scene_ba(
                pointmaps, result["poses"], stride=ba_stride,
                voxel=ba_voxel)
            result["poses"] = ba_poses
            result["ba_costs"] = np.asarray(ba_costs).tolist()
    return result


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from panst3r_tpu.apps.demo import load_images
    from panst3r_tpu.core.bucketing import Bucket
    from panst3r_tpu.engine.eval import ate_rmse
    from panst3r_tpu.engine.inference import InferenceEngine
    from panst3r_tpu.models.panst3r import PanSt3R
    from panst3r_tpu.models.presets import panst3r_v1_config, tiny_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", default="./slam_out")
    ap.add_argument("--preset", default="v1", choices=["v1", "tiny"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--gt-trajectory", default=None,
                    help="npz/json with (N, 4, 4) cam2world poses")
    ap.add_argument("--sim-threshold", type=float, default=0.9)
    ap.add_argument("--max-interval", type=int, default=5)
    ap.add_argument("--ba", action="store_true",
                    help="pointmap-anchored bundle adjustment after the "
                         "pose-graph refinement (engine/ba.py)")
    ap.add_argument("--ba-voxel", type=float, default=0.05)
    ap.add_argument("--ba-stride", type=int, default=8)
    args = ap.parse_args(argv)

    p = Path(args.images)
    paths = sorted(str(f) for f in p.iterdir()
                   if f.suffix.lower() in (".jpg", ".jpeg", ".png"))
    images, portrait, bucket = load_images(paths)

    cfg = {"v1": panst3r_v1_config, "tiny": tiny_config}[args.preset]()
    model = PanSt3R(cfg)
    grid = bucket.grid(16)
    lang_dim = cfg.panoptic.mask_transformer.lang_dim
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, bucket.height, bucket.width, 3), jnp.float32),
        jnp.zeros((1, 2), bool), jnp.zeros((4, lang_dim)), grid)
    if args.checkpoint:
        from panst3r_tpu.core.checkpoint import load_checkpoint

        tree, _, _ = load_checkpoint(
            Path(args.checkpoint).parent, Path(args.checkpoint).name,
            jax.tree_util.tree_map(np.asarray, params))
        params = tree

    engine = InferenceEngine(model, params, bucket, amp=True, chunk=1)
    result = run_slam(engine, images, args.sim_threshold, args.max_interval,
                      ba=args.ba, ba_voxel=args.ba_voxel,
                      ba_stride=args.ba_stride)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(out_dir / "trajectory.npz", poses=result["poses"],
             poses_init=result["poses_init"],
             keyframes=np.asarray(result["keyframes"]))
    meta = {"keyframes": result["keyframes"],
            "gn_costs": result["gn_costs"], "num_frames": len(images)}
    if args.gt_trajectory:
        gt = np.load(args.gt_trajectory)["poses"]
        meta["ate_rmse"] = ate_rmse(result["poses"], gt)
        meta["ate_rmse_init"] = ate_rmse(result["poses_init"], gt)
    (out_dir / "slam.json").write_text(json.dumps(meta, indent=2))
    print(json.dumps({k: v for k, v in meta.items() if k != "gn_costs"}))


if __name__ == "__main__":
    main()
