"""xplane trace of the panoptic stages (joint decode + frozen-query) on
the real chip — the lowest-MFU serve stages (~10% by the jaxpr counter).

Usage: python tools/profile_panoptic.py; feed the printed trace to
tools/xplane_summary.py.
"""
import os
import sys

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

    H, W, V, K, NCLS = 384, 512, 8, 4, 32
    rng = np.random.default_rng(0)
    model = PanSt3R(panst3r_v1_config())
    imgs = jnp.asarray(rng.standard_normal((1, 2, H, W, 3)), jnp.bfloat16)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), imgs, jnp.zeros((1, 2), bool),
        jnp.zeros((NCLS, 768), jnp.bfloat16), (H // 16, W // 16))
    eng = InferenceEngine(model, params, Bucket(H, W), num_keyframes=K,
                          chunk=4, amp=True)

    N = eng.n_tokens
    dt = jnp.bfloat16
    c = model.config
    x = jnp.asarray(rng.standard_normal((1, K, N, c.encoder.embed_dim)) * .3,
                    dt)
    y = jnp.asarray(rng.standard_normal((1, K, N, c.decoder.dim)) * .3, dt)
    dino = jnp.asarray(rng.standard_normal((1, K, N, c.dino.embed_dim)) * .3,
                       dt)
    img_k = jnp.asarray(
        rng.integers(0, 255, (1, K, H, W, 3)), jnp.uint8)
    pos = jnp.tile(
        jnp.stack(jnp.meshgrid(jnp.arange(H // 16), jnp.arange(W // 16),
                               indexing="ij"), -1).reshape(1, 1, N, 2),
        (1, K, 1, 1)).astype(jnp.int32)
    cls_emb = jnp.asarray(rng.standard_normal((NCLS, 768)), dt)
    portrait = jnp.zeros((1, K), bool)

    out = eng._panoptic_joint(eng.params, (x, y, dino), img_k, pos,
                              portrait, cls_emb)
    jax.block_until_ready(out)
    with jax.profiler.trace("/tmp/pan_trace"):
        for _ in range(3):
            out = eng._panoptic_joint(eng.params, (x, y, dino), img_k, pos,
                                      portrait, cls_emb)
            jax.block_until_ready(out)

    for root, _, files in os.walk("/tmp/pan_trace"):
        for f in files:
            if f.endswith(".xplane.pb"):
                print("TRACE:", os.path.join(root, f))


if __name__ == "__main__":
    main()
