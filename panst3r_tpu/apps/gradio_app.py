"""Gradio web UI for the reconstruction demo (optional dependency).

Equivalent of /root/reference/gradio_panst3r.py + the Blocks UI of
tools/demo_panst3r.py:690-763.  The gradio package is not baked into this
image; when present, this wraps the core pipeline (apps/demo.py) with an
upload-images → reconstruct → download-PLY/overlays interface and points
the user at the built-in WebGL viewer (apps/viewer.py) for 3D inspection.

Run:  python -m panst3r_tpu.apps.gradio_app --preset v1 [--checkpoint ...]
"""
from __future__ import annotations

import argparse
import tempfile
from pathlib import Path


def build_ui(engine_factory, classes, cls_emb):
    import gradio as gr
    import numpy as np

    from panst3r_tpu.apps.demo import (export_scene, load_images,
                                       reconstruct_scene)

    def run(files, num_keyframes, fusion):
        images, portrait, bucket = load_images([f.name for f in files])
        engine = engine_factory(bucket)
        scene = reconstruct_scene(engine, images, portrait, classes,
                                  cls_emb, fusion=fusion,
                                  num_keyframes=int(num_keyframes))
        out_dir = Path(tempfile.mkdtemp(prefix="panst3r_"))
        export_scene(out_dir, images, scene)
        overlays = sorted(str(p) for p in out_dir.glob("panoptic_*.png"))
        seg_table = [[s["id"], s.get("category_name", s["category_id"])]
                     for s in scene["segments_info"]]
        return overlays, str(out_dir / "scene.ply"), seg_table

    with gr.Blocks(title="panst3r_tpu") as ui:
        gr.Markdown("# panst3r_tpu — multi-view panoptic 3D reconstruction")
        files = gr.File(file_count="multiple", label="images")
        nkf = gr.Slider(2, 64, value=16, step=1, label="keyframes")
        fusion = gr.Radio(["standard_v2", "standard_v1", "qubo"],
                          value="standard_v2", label="fusion")
        btn = gr.Button("Reconstruct")
        gallery = gr.Gallery(label="panoptic overlays")
        ply = gr.File(label="scene.ply (open with apps/viewer.py)")
        table = gr.Dataframe(headers=["segment", "class"])
        btn.click(run, [files, nkf, fusion], [gallery, ply, table])
    return ui


def main(argv=None):
    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment; use the core "
            "pipeline instead:\n  python -m panst3r_tpu.apps.demo ... and "
            "view with\n  python -m panst3r_tpu.apps.viewer --scene ...")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from panst3r_tpu.apps.demo import SCANNET_CLASSES
    from panst3r_tpu.engine.inference import InferenceEngine
    from panst3r_tpu.models.panst3r import PanSt3R
    from panst3r_tpu.models.presets import panst3r_v1_config, tiny_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="v1", choices=["v1", "tiny"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args(argv)

    cfg = {"v1": panst3r_v1_config, "tiny": tiny_config}[args.preset]()
    model = PanSt3R(cfg)
    classes = SCANNET_CLASSES
    lang_dim = cfg.panoptic.mask_transformer.lang_dim
    rng = np.random.default_rng(0)
    cls_emb = rng.standard_normal((len(classes), lang_dim)).astype(np.float32)
    cls_emb /= np.linalg.norm(cls_emb, axis=-1, keepdims=True)

    params_cache = {}

    def engine_factory(bucket):
        if bucket not in params_cache:
            grid = bucket.grid(16)
            params = jax.jit(model.init, static_argnums=(4,))(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 2, bucket.height, bucket.width, 3)),
                jnp.zeros((1, 2), bool), jnp.asarray(cls_emb), grid)
            params_cache[bucket] = InferenceEngine(model, params, bucket,
                                                   amp=True)
        return params_cache[bucket]

    build_ui(engine_factory, classes, cls_emb).launch(server_port=args.port)


if __name__ == "__main__":
    main()
