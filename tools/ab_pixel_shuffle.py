"""A/B: MLP→pixel-shuffle vs fused transposed-conv upscaling (r4 weak #4).

`pixel_shuffle` after a Linear is a (B,H,W,r,r,C)→(B,H,r,W,r,C) relayout
— a physical copy on TPU (~3 ms/stage in the serve xplane).  The same
math is ONE stride-2 kernel-2 transposed conv (non-overlapping): each
input pixel emits its 2×2 block directly, with the Linear's weights
reshaped (in, 4C)→(2,2,in,C) and the 4C bias applied as a periodic
(2,2,C) pattern.  This probe times the three-stage v1 upscaler chain
both ways on chip and checks bit-level equivalence.
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

    from panst3r_tpu.models.upscalers.pixel_shuffle import pixel_shuffle
    from panst3r_tpu.ops.gelu import fast_gelu as gelu_fast

    B, gh, gw = 4, 24, 32
    C = 768
    dims = (512, 384, 256)       # fp_dim[1:] of the v1 config
    hf = 4.0
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, dtype)

    # per stage: W1 (Cin, hidden), b1, W2 (hidden, 4*Cout), b2
    weights = []
    cin = C
    for cout in dims:
        hidden = int(hf * cin)
        weights.append((mk((cin, hidden)), mk((hidden,)),
                        mk((hidden, 4 * cout)), mk((4 * cout,))))
        cin = cout

    x0 = mk((B, gh, gw, C))

    def mlp_shuffle_chain(x):
        for (w1, b1, w2, b2) in weights:
            h = gelu_fast(x @ w1 + b1)
            x = pixel_shuffle(h @ w2 + b2, 2)
        return x

    def conv_chain(x):
        for (w1, b1, w2, b2) in weights:
            h = gelu_fast(x @ w1 + b1)
            hidden = w2.shape[0]
            cout = w2.shape[1] // 4
            wk = w2.reshape(hidden, 2, 2, cout).transpose(1, 2, 0, 3)
            y = jax.lax.conv_transpose(
                h, wk, strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bias = b2.reshape(1, 1, 2, 1, 2, cout)
            Hh, Ww = y.shape[1] // 2, y.shape[2] // 2
            y = y.reshape(y.shape[0], Hh, 2, Ww, 2, cout) + bias
            x = y.reshape(y.shape[0], 2 * Hh, 2 * Ww, cout)
        return x

    f_ref = jax.jit(mlp_shuffle_chain)
    f_conv = jax.jit(conv_chain)
    a = np.asarray(f_ref(x0), np.float32)
    b = np.asarray(f_conv(x0), np.float32)
    d = np.abs(a - b)
    print(f"equivalence: max|d|={d.max():.2e} (bf16 scale "
          f"{np.abs(a).mean():.3f})")

    tiny = jax.jit(lambda x: x * 1.0)
    np.asarray(tiny(jnp.zeros(8)))
    t0 = time.perf_counter()
    np.asarray(tiny(jnp.zeros(8)))
    rtt = time.perf_counter() - t0

    REPS = int(os.environ.get("AB_REPS", "10"))
    for name, f in (("mlp+shuffle", f_ref), ("conv_transpose", f_conv)):
        # distinct scalings defeat CSE across the repeated calls
        g = jax.jit(lambda x, f=f: sum(f(x * (1.0 + i * 1e-3)).sum()
                                       for i in range(REPS)))
        np.asarray(g(x0))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(x0))
            best = min(best, time.perf_counter() - t0)
        per = (best - rtt) / REPS * 1e3
        print(f"{name}: {per:6.3f} ms per 3-stage chain (B={B})")


if __name__ == "__main__":
    main()
