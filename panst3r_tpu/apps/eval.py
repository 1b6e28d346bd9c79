"""PQ evaluation driver.

Fills the reference's eval gap (train.py:290 "TODO: testing would be done
here..."): runs the inference engine over dataset scenes, fuses masks
(v1/v2/qubo) and reports PQ/SQ/RQ (BASELINE PQ suite protocol: direct
multi-view prediction, README.md:124).

Run:  python -m panst3r_tpu.apps.eval --data-root ... --checkpoint out/final
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.core.bucketing import Bucket
from panst3r_tpu.core.checkpoint import load_checkpoint
from panst3r_tpu.data.loader import canonicalize_views
from panst3r_tpu.data.scannetpp import ScanNetppPanoptic
from panst3r_tpu.engine.eval import PQStat, gt_segments_from_maps, scene_pq, summarize
from panst3r_tpu.engine.fusion import (panoptic_fusion, panoptic_fusion_v1,
                                       qubo_fusion)
from panst3r_tpu.engine.inference import InferenceEngine
from panst3r_tpu.models.panst3r import PanSt3R
from panst3r_tpu.models.presets import (panst3r_v1_config, panst3r_v2_config,
                                        tiny_config)


def evaluate_scene(engine: InferenceEngine, views: list[dict],
                   classes: list[str], cls_emb: np.ndarray,
                   fusion: str = "standard_v2",
                   per_class: dict | None = None) -> dict:
    canon = canonicalize_views(views)
    H, W = canon["images"].shape[1:3]
    if fusion == "standard_v2":
        # Device-resident path: masks never leave the chip.
        out = engine.run_device(canon["images"].astype(np.float32),
                                canon["portrait"], cls_emb)
        res = engine.fuse(out, (H, W))[0]
    else:
        out = engine.run(canon["images"].astype(np.float32),
                         canon["portrait"], cls_emb)
        fuse = {"standard_v1": panoptic_fusion_v1,
                "qubo": qubo_fusion}[fusion]
        res = fuse(jnp.asarray(out["pred_logits"][None]),
                   jnp.asarray(out["pred_masks"][None]),  # (1, V, Q, h, w)
                   (H, W))[0]

    gt_pan, gt_segments = gt_segments_from_maps(
        canon["pan_inst_id"].astype(np.int64), canon["pan_cls_id"],
        canon["class_set"].split(";"), classes,
        crowd_inst_ids=canon.get("crowd_inst_ids"))
    if per_class is None:
        per_class = defaultdict(PQStat)
    scene_pq(np.asarray(res["pan"], np.int64), res["segments_info"],
             gt_pan, gt_segments, per_class)
    return per_class


def load_ported_npz(params, npz_path: str):
    """Overlay tools/port_torch_checkpoint.py output ('a/b/c' flat keys)
    onto an initialized param tree; reports what was applied/skipped."""
    flat = dict(np.load(npz_path))
    applied, skipped = 0, []
    params = jax.tree_util.tree_map(np.asarray, params)

    for key, val in flat.items():
        node = params["params"] if "params" in params else params
        parts = key.split("/")
        try:
            for p in parts[:-1]:
                node = node[p]
            assert node[parts[-1]].shape == val.shape, (
                key, node[parts[-1]].shape, val.shape)
            node[parts[-1]] = val
            applied += 1
        except (KeyError, AssertionError) as e:
            skipped.append((key, str(e)[:80]))
    print(f"ported weights: applied {applied}/{len(flat)}"
          + (f"; skipped {len(skipped)} (first: {skipped[:3]})"
             if skipped else ""))
    return jax.tree_util.tree_map(jnp.asarray, params)


def build_cls_embeddings(classes, lang_dim, text: str) -> np.ndarray:
    """'random' | 'siglip' | 'siglip2' | 'clip' | path to an .npz with
    {classes, embeddings} (a TextEncoder.state() dump)."""
    if text.endswith(".npz"):
        data = np.load(text, allow_pickle=True)
        table = {c: e for c, e in zip(list(data["classes"]),
                                      data["embeddings"])}
        emb = np.stack([table[c] for c in classes]).astype(np.float32)
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    if text != "random":
        from panst3r_tpu.models.text_encoder import (TextEncoder,
                                                     TextEncoderConfig)

        te = TextEncoder(TextEncoderConfig(model_name=text,
                                           fixed_vocab=False))
        return te(classes).astype(np.float32)
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((len(classes), lang_dim)).astype(np.float32)
    return emb / np.linalg.norm(emb, axis=-1, keepdims=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint dir (training output)")
    ap.add_argument("--ported-npz", default=None,
                    help="ported_params.npz from tools/port_torch_checkpoint")
    ap.add_argument("--preset", default="v1", choices=["v1", "v2", "tiny"])
    ap.add_argument("--benchmark", default="scannetpp",
                    choices=["scannetpp", "hypersim", "replica", "scannet"],
                    help="scannetpp = preprocessed training-format scenes; "
                         "others = rendered-test-image protocol adapters")
    ap.add_argument("--text", default="random",
                    help="random | siglip | siglip2 | clip | table.npz")
    ap.add_argument("--num-scenes", type=int, default=50)
    ap.add_argument("--num-views", type=int, default=4)
    ap.add_argument("--num-keyframes", type=int, default=4)
    ap.add_argument("--resolution", type=int, nargs=2, default=[512, 384])
    ap.add_argument("--fusion", default="standard_v2",
                    choices=["standard_v1", "standard_v2", "qubo"])
    ap.add_argument("--stuff-classes", default=None,
                    help="comma-separated class names treated as stuff for "
                         "the PQ_th/PQ_st split (default: categories.json "
                         "isthing flags if present, else all things — the "
                         "reference fusion's isthing=True behavior)")
    args = ap.parse_args(argv)

    W, H = args.resolution
    if args.benchmark == "scannetpp":
        dataset = ScanNetppPanoptic(args.data_root, resolution=(W, H),
                                    num_views=args.num_views, aug_crop=0)
        classes = sorted(set(dataset.classes))
    else:
        from panst3r_tpu.data.benchmarks import BenchmarkScenes

        dataset = BenchmarkScenes(args.data_root, args.benchmark,
                                  resolution=(W, H),
                                  num_views=args.num_views)
        classes = dataset.classes

    cfg = {"v1": panst3r_v1_config, "v2": panst3r_v2_config,
           "tiny": tiny_config}[args.preset]()
    model = PanSt3R(cfg)
    lang_dim = cfg.panoptic.mask_transformer.lang_dim
    cls_emb = build_cls_embeddings(classes, lang_dim, args.text)

    grid = (H // 16, W // 16)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, H, W, 3), jnp.float32),
        jnp.zeros((1, 2), bool), jnp.asarray(cls_emb), grid)
    if args.checkpoint:
        ckpt_dir, name = Path(args.checkpoint).parent, \
            Path(args.checkpoint).name
        tree, _, meta = load_checkpoint(ckpt_dir, name,
                                        jax.tree_util.tree_map(np.asarray,
                                                               params))
        params = tree
        if "classes" in meta:
            classes = meta["classes"]
    if args.ported_npz:
        params = load_ported_npz(params, args.ported_npz)

    engine = InferenceEngine(model, params, Bucket(H, W),
                             num_keyframes=args.num_keyframes, amp=True)

    # Things/Stuff category split: explicit flag > categories.json isthing
    # flags > all-things (the reference fusion's isthing=True behavior).
    if args.stuff_classes is not None:
        stuff_names = {s.strip() for s in args.stuff_classes.split(",")
                       if s.strip()}
    else:
        cats = getattr(dataset, "categories", None) or []
        stuff_names = {c["name"] for c in cats if not c.get("isthing", 1)}
    things = {i for i, c in enumerate(classes) if c not in stuff_names}

    per_class = defaultdict(PQStat)
    n = min(args.num_scenes, len(dataset))
    for i in range(n):
        views = dataset[i]
        evaluate_scene(engine, views, classes, cls_emb, args.fusion,
                       per_class)
        if (i + 1) % 10 == 0:
            print(f"[{i + 1}/{n}] {summarize(per_class)}")

    result = summarize(per_class, things=things)
    if args.benchmark != "scannetpp":
        from panst3r_tpu.data.benchmarks import REFERENCE_PQ

        # tiny preset has no published number — anchor to v1
        ref = REFERENCE_PQ.get((args.preset, args.benchmark),
                               REFERENCE_PQ.get(("v1", args.benchmark)))
        if ref is not None:
            result["reference_pq"] = ref
            result["vs_reference"] = round(result.get("PQ", 0.0) - ref, 2)
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
