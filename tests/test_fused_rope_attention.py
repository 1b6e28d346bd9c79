"""Fused RoPE+attention kernel parity (interpret mode) + table-form RoPE."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.ops.attention import dot_product_attention
from panst3r_tpu.ops.rope import (apply_rope_2d, apply_rope_tables,
                                  rope2d_tables)


def test_rope_table_form_matches_positional(rng):
    B, H, N, D = 2, 3, 20, 64
    tokens = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 32, (B, N, 2)), jnp.int32)
    cos, sin = rope2d_tables(pos, D)
    out_tab = apply_rope_tables(tokens, cos, sin)
    out_ref = apply_rope_2d(tokens, pos)
    np.testing.assert_allclose(np.asarray(out_tab), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_rope_kernel_matches_reference(rng):
    from jax.experimental.pallas import tpu as pltpu

    from panst3r_tpu.ops.pallas.flash_attention import pallas_mha_rope2d

    B, H, Nq, Nk, D = 1, 2, 100, 140, 64
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)), jnp.float32)
    qpos = jnp.asarray(rng.integers(0, 24, (B, Nq, 2)), jnp.int32)
    kpos = jnp.asarray(rng.integers(0, 24, (B, Nk, 2)), jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        out = pallas_mha_rope2d(q, k, v, qpos, kpos)

    ref = dot_product_attention(apply_rope_2d(q, qpos),
                                apply_rope_2d(k, kpos), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_rope_kernel_with_validity_mask(rng):
    from jax.experimental.pallas import tpu as pltpu

    from panst3r_tpu.ops.pallas.flash_attention import pallas_mha_rope2d

    B, H, Nq, Nk, D = 1, 2, 32, 96, 32
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)), jnp.float32)
    qpos = jnp.asarray(rng.integers(0, 16, (B, Nq, 2)), jnp.int32)
    kpos = jnp.asarray(rng.integers(0, 16, (B, Nk, 2)), jnp.int32)
    valid = (jnp.arange(Nk) < 50)[None].repeat(B, 0)

    with pltpu.force_tpu_interpret_mode():
        out = pallas_mha_rope2d(q, k, v, qpos, kpos,
                                mask=valid[:, None, None, :])
    ref = dot_product_attention(apply_rope_2d(q, qpos),
                                apply_rope_2d(k, kpos)[:, :, :50],
                                v[:, :, :50])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_rope_gradients(rng):
    """Custom VJP recompute path gives finite, matching gradients."""
    from panst3r_tpu.ops.attention import flash_attention_rope2d

    B, H, N, D = 1, 2, 12, 32
    q = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 8, (B, N, 2)), jnp.int32)

    def loss(q, k, v):
        return flash_attention_rope2d(q, k, v, qpos=pos, kpos=pos).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert np.abs(np.asarray(gi)).max() > 0


def test_split_cls_fixup_matches_concat(rng):
    """flash_attention_split_cls TPU path (kernel + rank-1 LSE fixup,
    interpret mode) == plain attention over [cls; patches]."""
    from jax.experimental.pallas import tpu as pltpu

    from panst3r_tpu.ops.attention import _split_cls_fixup, _split_cls_ref

    B, H, N, D = 2, 4, 130, 64
    q = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((B, H, 1, D)) * 0.5, jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, H, 1, D)) * 0.5, jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    scale = D ** -0.5

    with pltpu.force_tpu_interpret_mode():
        out_p, out_c = _split_cls_fixup(q, k, v, qc, kc, vc, scale)
    ref_p, ref_c = _split_cls_ref(q, k, v, qc, kc, vc, scale)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref_p),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                               rtol=1e-5, atol=2e-5)
