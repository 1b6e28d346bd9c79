"""Per-stage timing of the flagship inference pipeline on the real chip."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
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
    V, K, NCLS = 8, 4, 32
    rng = np.random.default_rng(0)
    images = (rng.standard_normal((V, H, W, 3)) * 0.3).astype(np.float32)
    portrait = np.zeros(V, bool)
    cls_emb = rng.standard_normal((NCLS, 768)).astype(np.float32)

    model = PanSt3R(panst3r_v1_config())
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, H, W, 3), jnp.bfloat16),
        jnp.zeros((1, 2), bool), jnp.zeros((NCLS, 768), jnp.bfloat16),
        (H // 16, W // 16))
    engine = InferenceEngine(model, params, Bucket(H, W), num_keyframes=K,
                             chunk=4, amp=True)

    # Warmup
    out = engine.run_device(images, portrait, cls_emb)
    engine.fuse(out, (H, W))

    def t(name, fn, *blockon_from):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        print(f"{name:28s} {dt * 1e3:9.1f} ms")
        return r

    images_dev = jnp.asarray(images)
    cls = jnp.asarray(cls_emb).astype(jnp.bfloat16)
    for rep in range(2):
        print(f"--- rep {rep} ---")
        xpos = t("encode (8 views)", lambda: engine._encode_all(images_dev))
        x, pos = xpos
        kf = jnp.arange(K)
        mem = t("memory build (4 kf)",
                lambda: engine.build_memory(x[kf], pos[kf]))
        rend = t("render kf (4)", lambda: engine._render_chunked(
            x[kf], pos[kf], mem))
        dino = t("dino kf (4)", lambda: engine._dino_chunked(images_dev[kf]))
        pan = t("panoptic joint", lambda: engine._panoptic_joint(
            engine.params, (x[kf][None], rend[1][None], dino[None]),
            images_dev[kf][None], pos[kf][None],
            jnp.zeros((1, K), bool), cls))
        nk = jnp.arange(K, V)
        rend2 = t("render nkf (4)", lambda: engine._render_chunked(
            x[nk], pos[nk], mem))
        dino2 = t("dino nkf (4)", lambda: engine._dino_chunked(
            images_dev[nk]))
        pan2 = t("panoptic queries", lambda: engine._panoptic_queries(
            engine.params, (x[nk][None], rend2[1][None], dino2[None]),
            images_dev[nk][None], pos[nk][None], jnp.zeros((1, K), bool),
            cls, pan["out_queries"]))
        full = t("FULL run_device", lambda: engine.run_device(
            images, portrait, cls_emb)["pred_masks"])
        t("fusion", lambda: engine.fuse(
            {"pred_logits": pan["pred_logits"][0],
             "pred_masks": jnp.concatenate(
                 [pan["pred_masks"][0], pan2["pred_masks"][0]])},
            (H, W))[0]["pan"])


if __name__ == "__main__":
    main()
