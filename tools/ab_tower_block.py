"""A/B the full ViT-L tower block on the real chip.

The round-2 serve trace showed the encoder at ~1.9 ms/layer vs a 0.88 ms
roofline, with the fc2+residual fusion (0.63 ms, 42% MFU, carrying an odd
u8[768,4096] side operand) and the attention custom call (0.49 ms) as the
two largest pieces.  This tool times 24-layer scans of block variants to
attribute the gap:

  mlp             LN -> fc1 -> gelu(erf) -> fc2 + res   (current form)
  mlp-barrier     same, optimization_barrier after gelu (force materialize)
  mlp-tanh        gelu tanh approximation (cost probe only, not prod)
  mlp-f32gelu     gelu evaluated in f32
  attn-block      LN -> qkv -> fused-rope attention -> proj + res
  full            complete Block (attn + mlp)

Methodology (see PERFORMANCE.md "Host-link pathology"): every timing loops
the layer L times inside one jit (lax.scan), fetches one scalar per rep,
and subtracts the measured RTT floor.
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

    from panst3r_tpu.ops.attention import flash_attention_rope2d
    from panst3r_tpu.ops.rope import patch_grid_positions

    B, N, C, F, H = 8, 768, 1024, 4096, 16
    L = 24
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, jnp.bfloat16)

    w_fc1, b_fc1 = mk(C, F), mk(F)
    w_fc2, b_fc2 = mk(F, C), mk(C)
    w_qkv, b_qkv = mk(C, 3 * C), mk(3 * C)
    w_proj, b_proj = mk(C, C), mk(C)
    ln_s = jnp.ones((C,), jnp.bfloat16)
    ln_b = jnp.zeros((C,), jnp.bfloat16)
    pos = jnp.broadcast_to(patch_grid_positions(24, 32)[None], (B, N, 2))
    x0 = mk(B, N, C)

    def ln(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype) \
            * ln_s + ln_b

    def gelu_erf(x):
        return jax.nn.gelu(x, approximate=False)

    def mlp(x, act=gelu_erf, barrier=False, f32=False, ln_barrier=False):
        n = ln(x)
        if ln_barrier:
            # Materialize the normalized operand: without this the fc1
            # matmul's operand fusion re-applies the LN math per output
            # tile (same pathology as the GELU fold into fc2).
            n = jax.lax.optimization_barrier(n)
        h = n @ w_fc1 + b_fc1
        if f32:
            h = act(h.astype(jnp.float32)).astype(x.dtype)
        else:
            h = act(h)
        if barrier:
            h = jax.lax.optimization_barrier(h)
        return x + (h @ w_fc2 + b_fc2)

    def attn_block(x):
        qkv = ln(x) @ w_qkv + b_qkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def sh(t):
            return t.reshape(B, N, H, C // H).transpose(0, 2, 1, 3)

        o = flash_attention_rope2d(sh(q), sh(k), sh(v), qpos=pos, kpos=pos)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        return x + (o @ w_proj + b_proj)

    from panst3r_tpu.ops.attention import flash_attention_rope2d_tables
    from panst3r_tpu.ops.rope import rope2d_tables

    tabs = rope2d_tables(pos, C // H, 100.0)

    def attn_block_tabs(x, ln_barrier=False):
        n = ln(x)
        if ln_barrier:
            n = jax.lax.optimization_barrier(n)
        qkv = n @ w_qkv + b_qkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def sh(t):
            return t.reshape(B, N, H, C // H).transpose(0, 2, 1, 3)

        o = flash_attention_rope2d_tables(sh(q), sh(k), sh(v), qtab=tabs,
                                          ktab=tabs)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        return x + (o @ w_proj + b_proj)

    from panst3r_tpu.ops.gelu import fast_gelu

    variants = {
        "mlp": lambda x: mlp(x),
        "mlp-barrier": lambda x: mlp(x, barrier=True),
        "mlp-tanh": lambda x: mlp(
            x, act=lambda t: jax.nn.gelu(t, approximate=True)),
        "mlp-f32gelu": lambda x: mlp(x, f32=True),
        "mlp-fastgelu": lambda x: mlp(x, act=fast_gelu),
        "mlp-fastgelu-barrier": lambda x: mlp(x, act=fast_gelu,
                                              barrier=True),
        "attn-block": attn_block,
        "attn-block-tabs": attn_block_tabs,
        "full": lambda x: mlp(attn_block(x)),
        "full-fast": lambda x: mlp(attn_block_tabs(x), act=fast_gelu,
                                   barrier=True),
        "mlp-lnb": lambda x: mlp(x, act=fast_gelu, barrier=True,
                                 ln_barrier=True),
        "attn-tabs-lnb": lambda x: attn_block_tabs(x, ln_barrier=True),
        "full-fast-lnb": lambda x: mlp(attn_block_tabs(x, ln_barrier=True),
                                       act=fast_gelu, barrier=True,
                                       ln_barrier=True),
    }

    def scan_of(fn):
        def step(c, _):
            return fn(c), ()

        return jax.jit(
            lambda x: jax.lax.scan(step, x, None, length=L)[0][0, 0, :4]
            .astype(jnp.float32))

    tiny = jax.jit(lambda x: x + 1.0)
    _ = np.asarray(tiny(jnp.zeros(8)))  # enter serialized regime
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(tiny(jnp.zeros(8)))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"RTT floor: {rtt*1e3:.1f} ms")

    for name, fn in variants.items():
        f = scan_of(fn)
        _ = np.asarray(f(x0))  # compile
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            _ = np.asarray(f(x0))
            ts.append(time.perf_counter() - t0)
        dt = (min(ts) - rtt) / L
        print(f"{name:14s} {dt*1e3:7.3f} ms/layer")


if __name__ == "__main__":
    main()
