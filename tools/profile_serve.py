"""xplane trace of the one-program serve path on the real chip.

Runs `InferenceEngine.serve_device` (the whole-scene wire program) a few
times under jax.profiler.trace and prints the trace path; feed it to
tools/xplane_summary.py for the op-level breakdown.
Usage: python tools/profile_serve.py [--views 8] [--half]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--keyframes", type=int, default=4)
    ap.add_argument("--half", action="store_true",
                    help="fusion_res='mask' (half-res wire)")
    ap.add_argument("--out", default="/tmp/serve_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from panst3r_tpu.core.bucketing import Bucket
    from panst3r_tpu.engine.inference import InferenceEngine
    from panst3r_tpu.models.panst3r import PanSt3R
    from panst3r_tpu.models.presets import panst3r_v1_config

    H, W = 384, 512
    V, K, NCLS = args.views, args.keyframes, 32
    rng = np.random.default_rng(0)
    images = (rng.standard_normal((V, H, W, 3)) * 40 + 127).astype(np.uint8)
    portrait = np.zeros(V, bool)
    cls_emb = rng.standard_normal((NCLS, 768)).astype(np.float32)

    model = PanSt3R(panst3r_v1_config())
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, H, W, 3), jnp.bfloat16),
        jnp.zeros((1, 2), bool), jnp.zeros((NCLS, 768), jnp.bfloat16),
        (H // 16, W // 16))
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=K,
                             chunk=4, amp=True)
    fusion_res = "mask" if args.half else "hybrid"

    wire = engine.serve_device(images, portrait, cls_emb,
                               fusion_res=fusion_res)
    jax.block_until_ready(wire)
    with jax.profiler.trace(args.out):
        for _ in range(3):
            wire = engine.serve_device(images, portrait, cls_emb,
                                       fusion_res=fusion_res)
            jax.block_until_ready(wire)

    for root, _, files in os.walk(args.out):
        for f in files:
            if f.endswith(".xplane.pb"):
                print("TRACE:", os.path.join(root, f))


if __name__ == "__main__":
    main()
