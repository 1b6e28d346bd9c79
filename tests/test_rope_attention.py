"""Numerics tests for RoPE and attention vs independent torch references.

The RoPE formula is checked against a from-scratch torch implementation of
the croco 'RoPE100' semantics (freq base 100, NeoX rotate-half layout,
y-half/x-half split) — the contract the cuRoPE CUDA kernel implements in the
reference stack (/root/reference/README.md:67-71).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from panst3r_tpu.ops.attention import dot_product_attention, memory_mask_bias
from panst3r_tpu.ops.rope import apply_rope_2d, patch_grid_positions


def torch_rope_1d(tokens, pos1d, base, D):
    # Independent re-derivation of 1-D NeoX RoPE for verification.
    inv_freq = 1.0 / (base ** (torch.arange(0, D, 2).float() / D))
    ang = pos1d.float()[..., None] * inv_freq  # (B, N, D/2)
    ang = torch.cat([ang, ang], dim=-1)
    cos, sin = ang.cos()[:, None], ang.sin()[:, None]
    x1, x2 = tokens[..., : D // 2], tokens[..., D // 2:]
    rot = torch.cat([-x2, x1], dim=-1)
    return tokens * cos + rot * sin


def torch_rope_2d(tokens, positions, base=100.0):
    D = tokens.shape[-1] // 2
    y, x = tokens.split(D, dim=-1)
    y = torch_rope_1d(y, positions[..., 0], base, D)
    x = torch_rope_1d(x, positions[..., 1], base, D)
    return torch.cat([y, x], dim=-1)


def test_rope2d_matches_torch_reference(rng):
    B, H, N, D = 2, 4, 24, 64
    tokens = rng.standard_normal((B, H, N, D)).astype(np.float32)
    pos = rng.integers(0, 32, size=(B, N, 2)).astype(np.int32)

    ours = apply_rope_2d(jnp.asarray(tokens), jnp.asarray(pos))
    theirs = torch_rope_2d(torch.from_numpy(tokens), torch.from_numpy(pos))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_rope_preserves_norm(rng):
    tokens = jnp.asarray(rng.standard_normal((1, 2, 16, 64)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 32, (1, 16, 2)), jnp.int32)
    out = apply_rope_2d(tokens, pos)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(tokens), axis=-1), rtol=1e-5)


def test_rope_zero_position_identity(rng):
    tokens = jnp.asarray(rng.standard_normal((1, 1, 8, 32)), jnp.float32)
    pos = jnp.zeros((1, 8, 2), jnp.int32)
    np.testing.assert_allclose(np.asarray(apply_rope_2d(tokens, pos)),
                               np.asarray(tokens), atol=1e-6)


def test_attention_matches_torch(rng):
    B, H, Nq, Nk, D = 2, 3, 16, 24, 32
    q = rng.standard_normal((B, H, Nq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Nk, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Nk, D)).astype(np.float32)

    ours = dot_product_attention(*map(jnp.asarray, (q, k, v)))
    theirs = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_attention_mask_blocks_keys(rng):
    B, H, Nq, Nk, D = 1, 2, 4, 10, 16
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, n, D)), jnp.float32)
               for n in (Nq, Nk, Nk))
    valid = jnp.arange(Nk) < 6
    bias = memory_mask_bias(valid[None])
    out_masked = dot_product_attention(q, k, v, bias=bias)
    out_trunc = dot_product_attention(q, k[:, :, :6], v[:, :, :6])
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc),
                               rtol=1e-5, atol=1e-6)


def test_patch_grid_positions():
    pos = np.asarray(patch_grid_positions(2, 3))
    expected = [[0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [1, 2]]
    np.testing.assert_array_equal(pos, expected)


def test_flash_kernel_interpret_matches_reference(rng):
    """Pallas kernel in interpreter mode vs the jnp reference."""
    from panst3r_tpu.ops.pallas import flash_attention as fa

    B, H, Nq, Nk, D = 1, 2, 130, 200, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, n, D)) * 0.5,
                           jnp.float32) for n in (Nq, Nk, Nk))

    import jax.experimental.pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = fa.pallas_mha(q, k, v)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_kernel_with_bias_and_validity(rng):
    from panst3r_tpu.ops.pallas import flash_attention as fa
    from jax.experimental.pallas import tpu as pltpu

    B, H, Nq, Nk, D = 1, 2, 64, 160, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, n, D)) * 0.5,
                           jnp.float32) for n in (Nq, Nk, Nk))
    bias = jnp.asarray(
        np.where(rng.random((B, H, Nq, Nk)) < 0.3, -1e9, 0.0), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fa.pallas_mha(q, k, v, bias=bias)
    ref = dot_product_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    valid = jnp.arange(Nk)[None] < 100
    mask4 = valid[:, None, None, :]
    with pltpu.force_tpu_interpret_mode():
        out2 = fa.pallas_mha(q, k, v, mask=jnp.broadcast_to(mask4, (B, 1, 1, Nk)))
    ref2 = dot_product_attention(q, k[:, :, :100], v[:, :, :100])
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-3, atol=2e-3)


def test_flash_kernel_bias_plus_kv_valid_combined(rng):
    """Regression: bias AND (B,1,1,Nk) validity mask together must both
    apply (previously kv_valid was silently dropped when bias was set)."""
    from panst3r_tpu.ops.pallas import flash_attention as fa
    from jax.experimental.pallas import tpu as pltpu

    B, H, Nq, Nk, D = 1, 2, 64, 160, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, n, D)) * 0.5,
                           jnp.float32) for n in (Nq, Nk, Nk))
    bias = jnp.asarray(
        np.where(rng.random((B, H, Nq, Nk)) < 0.3, -1e9, 0.0), jnp.float32)
    valid = jnp.arange(Nk)[None] < 100
    mask4 = jnp.broadcast_to(valid[:, None, None, :], (B, 1, 1, Nk))

    with pltpu.force_tpu_interpret_mode():
        out = fa.pallas_mha(q, k, v, bias=bias, mask=mask4)
    ref = dot_product_attention(q, k, v, bias=bias,
                                mask=valid[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
