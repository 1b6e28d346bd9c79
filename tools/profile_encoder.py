"""Per-op profile of the ViT-L encoder stage on the real chip.

Times the 8-view 512x384 encoder forward (the serve program's encoder
stage) in isolation, captures an xplane trace, and prints the top ops.
Usage: python tools/profile_encoder.py [--views 8]
"""
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

    from panst3r_tpu.models.encoder import ViTEncoder
    from panst3r_tpu.models.presets import panst3r_v1_config

    H, W, V = 384, 512, 8
    cfg = panst3r_v1_config().encoder
    enc = ViTEncoder(cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((V, H, W, 3)), jnp.bfloat16)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), imgs[:1])
    # Serve regime: bf16 params (InferenceEngine amp=True) — f32 params
    # promote every activation to f32 and profile a different program.
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, params)

    fwd = jax.jit(lambda p, x: enc.apply(p, x))
    out = fwd(params, imgs)
    jax.block_until_ready(out)

    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(params, imgs))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    # ViT-L/16 FLOPs for V views of N=768 tokens, dim 1024
    N = (H // 16) * (W // 16)
    D, F, L = 1024, 4096, 24
    per_layer = 2 * N * D * (3 * D) + 2 * 2 * N * N * D + 2 * N * D * D \
        + 2 * 2 * N * D * F
    flops = V * L * per_layer
    print(f"encoder fwd {V} views: {dt*1e3:.1f} ms  "
          f"{flops/dt/1e12:.1f} TF/s  (~{flops/dt/197e12*100:.0f}% MFU bf16)")

    trace_dir = "/tmp/enc_trace"
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(fwd(params, imgs))
    # find the xplane file
    for root, _, files in os.walk(trace_dir):
        for f in files:
            if f.endswith(".xplane.pb"):
                print("TRACE:", os.path.join(root, f))


if __name__ == "__main__":
    main()
