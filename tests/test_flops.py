"""jaxpr matmul-FLOP counter (MFU accounting) vs hand counts."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.ops.flops import fn_matmul_flops


def test_plain_matmul():
    a = jax.ShapeDtypeStruct((7, 64, 32), jnp.float32)
    b = jax.ShapeDtypeStruct((32, 96), jnp.float32)
    got = fn_matmul_flops(lambda a, b: a @ b, a, b)
    assert got == 2 * 7 * 64 * 32 * 96


def test_batched_dot_general():
    a = jax.ShapeDtypeStruct((4, 10, 16), jnp.float32)
    b = jax.ShapeDtypeStruct((4, 16, 20), jnp.float32)
    got = fn_matmul_flops(lambda a, b: jnp.einsum("bij,bjk->bik", a, b), a, b)
    assert got == 2 * 4 * 10 * 16 * 20


def test_scan_multiplies_by_length():
    w = jax.ShapeDtypeStruct((32, 32), jnp.float32)
    x = jax.ShapeDtypeStruct((8, 32), jnp.float32)

    def f(x, w):
        def step(c, _):
            return c @ w, ()
        return jax.lax.scan(step, x, None, length=24)[0]

    got = fn_matmul_flops(f, x, w)
    assert got == 24 * 2 * 8 * 32 * 32


def test_conv():
    x = jax.ShapeDtypeStruct((1, 16, 16, 8), jnp.float32)

    def f(x):
        return nn.Conv(12, (3, 3), padding="SAME").apply(
            {"params": {"kernel": jnp.zeros((3, 3, 8, 12)),
                        "bias": jnp.zeros((12,))}}, x)

    got = fn_matmul_flops(f, x)
    assert got == 2 * (1 * 16 * 16 * 12) * 8 * 9


def test_vit_tower_matches_hand_count():
    """The flagship encoder tower: hand formula vs counter."""
    from panst3r_tpu.models.encoder import ViTEncoder
    from panst3r_tpu.models.presets import panst3r_v1_config

    H, W, V = 64, 96, 2
    enc = ViTEncoder(panst3r_v1_config().encoder)
    imgs = jnp.zeros((V, H, W, 3), jnp.bfloat16)
    params = jax.eval_shape(
        lambda: jax.jit(enc.init)(jax.random.PRNGKey(0), imgs))
    got = fn_matmul_flops(lambda p, x: enc.apply(p, x), params, imgs)

    N, D, F, L, hd = (H // 16) * (W // 16), 1024, 4096, 24, 64
    per_layer = (2 * N * D * 3 * D      # qkv
                 + 2 * 2 * N * N * D    # qk^T + av
                 + 2 * N * D * D        # proj
                 + 2 * 2 * N * D * F)   # fc1 + fc2
    patch = 2 * N * (16 * 16 * 3) * D   # patch embed conv
    expect = V * (L * per_layer + patch)
    np.testing.assert_allclose(got, expect, rtol=0.02)
