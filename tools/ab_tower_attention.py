"""A/B the ViT-tower attention shape on the real chip.

Compares, at the serve encoder shape (B=8 views, H=16, N=768, D=64, bf16),
a 24-layer scan of:
  a) jnp 2D-RoPE + XLA-native attention      (current routing)
  b) fused-RoPE Pallas kernel                (in-kernel tables, bf16 matmul)
  c) plain XLA-native attention (no RoPE)    (the DINO shape)
  d) plain Pallas kernel (no RoPE)

Reports per-layer ms after subtracting the measured RTT floor (single
tiny-op dispatch), since any fetch serializes the tunneled runtime.
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

    from panst3r_tpu.ops.attention import dot_product_attention
    from panst3r_tpu.ops.pallas.flash_attention import (pallas_mha,
                                                        pallas_mha_rope2d)
    from panst3r_tpu.ops.rope import apply_rope_2d, patch_grid_positions

    B, H, N, D = 8, 16, 768, 64
    L = 24
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    pos = jnp.broadcast_to(patch_grid_positions(24, 32)[None], (B, N, 2))

    def scan_of(fn):
        def step(c, _):
            o = fn(c)
            return o, ()
        return jax.jit(lambda q: jax.lax.scan(step, q, None, length=L)[0])

    variants = {
        "xla+jnp-rope": scan_of(lambda x: dot_product_attention(
            apply_rope_2d(x, pos, 100.0), apply_rope_2d(k, pos, 100.0), v)),
        "pallas-fused-rope": scan_of(lambda x: pallas_mha_rope2d(
            x, k, v, pos, pos)),
        "xla-plain": scan_of(lambda x: dot_product_attention(x, k, v)),
        "pallas-plain": scan_of(lambda x: pallas_mha(x, k, v)),
    }

    # RTT floor: dispatch+fetch of a trivial op.
    tiny = jax.jit(lambda x: x + 1.0)
    _ = np.asarray(tiny(jnp.zeros(8)))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        _ = np.asarray(tiny(jnp.zeros(8)))
    rtt = (time.perf_counter() - t0) / reps
    print(f"RTT floor: {rtt * 1e3:.2f} ms")

    for name, fn in variants.items():
        out = fn(q)
        np.asarray(out[0, 0, 0, :2])  # warm + enter serialized regime
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(q)
            np.asarray(out[0, 0, 0, :2])
            best = min(best, time.perf_counter() - t0)
        per_layer = (best - rtt) / L * 1e3
        print(f"{name:20s} {best * 1e3:8.1f} ms total  "
              f"{per_layer:6.3f} ms/layer")


if __name__ == "__main__":
    main()
