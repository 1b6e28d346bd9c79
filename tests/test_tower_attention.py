"""Transpose-free tower self-attention kernel parity (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from panst3r_tpu.ops.pallas.tower_attention import (_tower_fwd, _tower_ref,
                                                    supports_tower_attention,
                                                    tower_self_attention)


def _mk(rng, B, N, C, cls=False, tabs=False):
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * C)) * 0.5, jnp.float32)
    t = None
    if tabs:
        from panst3r_tpu.ops.rope import rope2d_tables

        pos = jnp.asarray(rng.integers(0, 32, (B, N, 2)), jnp.int32)
        t = rope2d_tables(pos, 64)
    ckv = None
    if cls:
        ckv = (jnp.asarray(rng.standard_normal((B, 1, C)) * 0.5, jnp.float32),
               jnp.asarray(rng.standard_normal((B, 1, C)), jnp.float32))
    return qkv, t, ckv


@pytest.mark.parametrize("N,C,cls,tabs", [
    (128, 128, False, False),      # minimal: one pair
    (256, 256, False, True),       # rope
    (130, 128, False, False),      # row padding + key mask
    (256, 256, True, False),       # cls fixup
    (130, 256, True, True),        # everything + padding
])
def test_tower_kernel_matches_reference(rng, N, C, cls, tabs):
    qkv, t, ckv = _mk(rng, 2, N, C, cls=cls, tabs=tabs)
    scale = 64 ** -0.5
    with pltpu.force_tpu_interpret_mode():
        out = _tower_fwd(qkv, t, ckv, scale)
    ref = _tower_ref(qkv, t, ckv, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_supports_gate():
    assert supports_tower_attention(768, 1024, 16)
    assert supports_tower_attention(768, 768, 12)
    assert not supports_tower_attention(2048, 1024, 16)   # > one k-block
    assert not supports_tower_attention(768, 1024, 8)     # d=128 heads
    assert not supports_tower_attention(768, 832, 13)     # odd pair count


def test_tower_backward_matches_reference(rng):
    """custom_vjp recompute backward == jnp reference gradients."""
    qkv, t, ckv = _mk(rng, 1, 64, 128, cls=True, tabs=True)
    scale = 64 ** -0.5

    def f_kernel(qkv, ckv):
        with pltpu.force_tpu_interpret_mode():
            return (tower_self_attention(qkv, 2, tabs=t, cls_kv=ckv,
                                         scale=scale) ** 2).sum()

    def f_ref(qkv, ckv):
        return (_tower_ref(qkv, t, ckv, scale) ** 2).sum()

    g_k = jax.grad(f_kernel, argnums=(0, 1))(qkv, ckv)
    g_r = jax.grad(f_ref, argnums=(0, 1))(qkv, ckv)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_dino_split_cls_tower_routing_matches(rng, monkeypatch):
    """_SplitClsSelfAttention's tower-kernel route (in-kernel cls fixup +
    jnp cls row) == the generic flash_attention_split_cls path."""
    import panst3r_tpu.ops.attention as attn_mod
    from panst3r_tpu.models.dino import _SplitClsSelfAttention

    B, N, C, H = 2, 128, 128, 2
    x = jnp.asarray(rng.standard_normal((B, N, C)) * 0.5, jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, 1, C)) * 0.5, jnp.float32)
    mod = _SplitClsSelfAttention(H)
    params = mod.init(jax.random.PRNGKey(0), x, c)

    out_ref = mod.apply(params, x, c)   # CPU: generic split-cls path

    monkeypatch.setattr(attn_mod, "_use_pallas", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        out_tower = mod.apply(params, x, c)

    for a, b in zip(out_tower, out_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_self_attention_tower_routing_matches(rng, monkeypatch):
    """blocks.SelfAttention tower route (fused-qkv kernel, rope tables) ==
    the split-head path, on identical params."""
    import panst3r_tpu.ops.attention as attn_mod
    from panst3r_tpu.models.blocks import SelfAttention
    from panst3r_tpu.ops.rope import rope2d_tables

    B, N, C, H = 2, 128, 128, 2
    x = jnp.asarray(rng.standard_normal((B, N, C)) * 0.5, jnp.float32)
    pos = jnp.asarray(rng.integers(0, 16, (B, N, 2)), jnp.int32)
    tabs = rope2d_tables(pos, C // H, 100.0)
    mod = SelfAttention(H, rope_base=100.0)
    params = mod.init(jax.random.PRNGKey(0), x, tabs=tabs)

    out_ref = mod.apply(params, x, tabs=tabs)

    monkeypatch.setattr(attn_mod, "_use_pallas", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        out_tower = mod.apply(params, x, tabs=tabs)

    np.testing.assert_allclose(np.asarray(out_tower), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
