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


@pytest.mark.parametrize("Nq,Nk,C,rope,bias", [
    (256, 384, 128, False, False),
    (256, 1024, 128, True, True),      # multi-block keys + bias + rope
    (130, 200, 128, False, True),      # both sides padded
    (512, 640, 256, True, False),      # 4 heads, padded keys
])
def test_tower_cross_matches_reference(rng, Nq, Nk, C, rope, bias):
    from panst3r_tpu.ops.pallas.tower_attention import (_cross_fwd,
                                                        _cross_ref)
    from panst3r_tpu.ops.rope import rope2d_tables

    B = 2
    q = jnp.asarray(rng.standard_normal((B, Nq, C)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Nk, C)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Nk, C)), jnp.float32)
    qtab = ktab = None
    if rope:
        qp = jnp.asarray(rng.integers(0, 32, (B, Nq, 2)), jnp.int32)
        kp = jnp.asarray(rng.integers(0, 32, (B, Nk, 2)), jnp.int32)
        qtab = rope2d_tables(qp, 64)
        ktab = rope2d_tables(kp, 64)
    kv_bias = None
    if bias:
        # validity-style bias incl. fully-masked slots
        valid = rng.random((B, Nk)) > 0.3
        kv_bias = jnp.where(jnp.asarray(valid), 0.0, -jnp.inf)
    scale = 64 ** -0.5

    with pltpu.force_tpu_interpret_mode():
        out = _cross_fwd(q, k, v, qtab, ktab, kv_bias, scale)
    ref = _cross_ref(q, k, v, qtab, ktab,
                     jnp.where(jnp.isinf(kv_bias),
                               jnp.float32(np.finfo(np.float32).min),
                               kv_bias) if kv_bias is not None else None,
                     scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_cross_attention_tower_routing_matches(rng, monkeypatch):
    """blocks.CrossAttention tower route == split-head path on identical
    params (rope tables + per-key validity bias, the decoder call form)."""
    import panst3r_tpu.ops.attention as attn_mod
    from panst3r_tpu.models.blocks import CrossAttention
    from panst3r_tpu.ops.attention import memory_mask_bias
    from panst3r_tpu.ops.rope import rope2d_tables

    B, Nq, Nk, C, H = 1, 256, 384, 128, 2
    x = jnp.asarray(rng.standard_normal((B, Nq, C)) * 0.5, jnp.float32)
    kv = jnp.asarray(rng.standard_normal((B, Nk, C)) * 0.5, jnp.float32)
    qtab = rope2d_tables(
        jnp.asarray(rng.integers(0, 16, (B, Nq, 2)), jnp.int32), 64)
    ktab = rope2d_tables(
        jnp.asarray(rng.integers(0, 16, (B, Nk, 2)), jnp.int32), 64)
    valid = jnp.asarray(rng.random((B, Nk)) > 0.25)
    bias = memory_mask_bias(valid)

    mod = CrossAttention(H, rope_base=100.0)
    params = mod.init(jax.random.PRNGKey(0), x, kv, kv, qtab=qtab,
                      ktab=ktab, bias=bias)
    out_ref = mod.apply(params, x, kv, kv, qtab=qtab, ktab=ktab, bias=bias)

    monkeypatch.setattr(attn_mod, "_use_pallas", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        out_tower = mod.apply(params, x, kv, kv, qtab=qtab, ktab=ktab,
                              bias=bias)
    np.testing.assert_allclose(np.asarray(out_tower), np.asarray(out_ref),
                               rtol=3e-5, atol=3e-5)


def test_tower_cross_backward_matches_reference(rng):
    from panst3r_tpu.ops.pallas.tower_attention import (_cross_ref,
                                                        tower_cross_attention)

    B, Nq, Nk, C = 1, 64, 96, 128
    q = jnp.asarray(rng.standard_normal((B, Nq, C)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Nk, C)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Nk, C)), jnp.float32)
    scale = 64 ** -0.5

    def f_kernel(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return (tower_cross_attention(q, k, v, scale=scale) ** 2).sum()

    def f_ref(q, k, v):
        return (_cross_ref(q, k, v, None, None, None, scale) ** 2).sum()

    g_k = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_tower_cross_block_skip_exact(rng):
    """A fully-invalid key BLOCK (ring-buffer empty slots) is skipped by
    pl.when — results must equal the reference with those keys masked."""
    from panst3r_tpu.ops.pallas.tower_attention import (_cross_fwd,
                                                        _cross_ref)

    B, Nq, Nk, C = 1, 256, 1024, 128   # bk=512 -> 2 key blocks
    q = jnp.asarray(rng.standard_normal((B, Nq, C)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Nk, C)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Nk, C)), jnp.float32)
    neg = float(np.finfo(np.float32).min)
    # second half entirely invalid -> its 512-block is skipped
    kv_bias = jnp.concatenate([jnp.zeros((B, 512)),
                               jnp.full((B, 512), neg)], axis=1)
    scale = 64 ** -0.5
    with pltpu.force_tpu_interpret_mode():
        out = _cross_fwd(q, k, v, None, None, kv_bias, scale,
                         block_k=512)
    ref = _cross_ref(q[:, :, :], k[:, :512], v[:, :512], None, None,
                     None, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_tower_cross_sub_k_matches(rng):
    """The in-kernel k sub-split (sub_k > 1) is bit-equivalent to the
    default single-chain path for every sub_k, with and without a
    validity bias (r5 measured lever, kept as an option)."""
    from panst3r_tpu.ops.pallas.tower_attention import _cross_fwd, _cross_ref
    from panst3r_tpu.ops.rope import rope2d_tables

    B, Nq, Nk, C = 1, 256, 1536, 128
    q = jnp.asarray(rng.standard_normal((B, Nq, C)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Nk, C)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Nk, C)), jnp.float32)

    def tabs(n):
        pos = np.stack(np.meshgrid(np.arange(n // 32), np.arange(32),
                                   indexing="ij"), -1).reshape(-1, 2)
        return rope2d_tables(jnp.asarray(np.tile(pos, (B, 1, 1))[:, :n]), 64)

    neg = float(np.finfo(np.float32).min)
    bias = np.zeros((B, Nk), np.float32)
    bias[:, Nk // 2:] = neg                 # half invalid
    bias[:, 200:360] = -0.4                 # soft-biased span
    scale = 64 ** -0.5
    for kv_bias in (None, jnp.asarray(bias)):
        ref = _cross_ref(q, k, v, tabs(Nq), tabs(Nk), kv_bias, scale)
        for sub in (1, 2, 4):
            with pltpu.force_tpu_interpret_mode():
                out = _cross_fwd(q, k, v, tabs(Nq), tabs(Nk), kv_bias,
                                 scale, block_q=256, block_k=384,
                                 sub_k=sub)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=3e-5, atol=3e-5)


def test_tower_cross_kv_int8_close_to_f32(rng):
    """Opt-in int8-KV scores (kv_int8=True): k pre-rotated + per-tensor
    quantized, q row-quantized in-kernel, int8x8->int32 score matmul
    with scales folded into the softmax stabilizer.  The softmax
    weights shift by the quantization error only: outputs stay within
    ~1e-3 of the f32 kernel on unit-scale inputs (cosine > 0.9999),
    and fully-masked key handling is unchanged."""
    import panst3r_tpu.ops.pallas.tower_attention as ta
    from panst3r_tpu.ops.pallas.tower_attention import _cross_fwd
    from panst3r_tpu.ops.rope import rope2d_tables

    B, Nq, Nk, C = 2, 256, 384, 128
    # the production gate engages int8 only at render-scale Nq; drop it
    # so the path runs at test shapes
    orig_gate = ta._INT8_MIN_NQ
    ta._INT8_MIN_NQ = 0
    q = jnp.asarray(rng.standard_normal((B, Nq, C)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Nk, C)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Nk, C)), jnp.float32)
    qtab = rope2d_tables(
        jnp.asarray(rng.integers(0, 32, (B, Nq, 2)), jnp.int32), 64)
    ktab = rope2d_tables(
        jnp.asarray(rng.integers(0, 32, (B, Nk, 2)), jnp.int32), 64)
    valid = rng.random((B, Nk)) > 0.3
    bias = jnp.where(jnp.asarray(valid), 0.0, -jnp.inf)
    scale = 64 ** -0.5

    try:
        with pltpu.force_tpu_interpret_mode():
            out_f = _cross_fwd(q, k, v, qtab, ktab, bias, scale)
            out_8 = _cross_fwd(q, k, v, qtab, ktab, bias, scale,
                               kv_int8=True)
    finally:
        ta._INT8_MIN_NQ = orig_gate
    a, b = np.asarray(out_f), np.asarray(out_8)
    assert np.abs(a - b).max() < 5e-3, np.abs(a - b).max()
    cos = (a.ravel() @ b.ravel()) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.9999, cos
    # the int8 output must actually DIFFER from f32 (the path ran)
    assert np.abs(a - b).max() > 0.0
