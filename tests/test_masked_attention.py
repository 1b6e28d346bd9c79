"""Block-sparse masked cross-attention kernel vs dense reference.

Covers the Pallas TPU kernel (interpret mode on CPU): the sparse visit
plan, forward parity on object-like blocked patterns, padding, the dense
custom-VJP backward, and the MaskTransformer integration (forced kernel
path == jnp fallback path).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from panst3r_tpu.ops.attention import dot_product_attention
from panst3r_tpu.ops.pallas.masked_attention import (pallas_masked_mha,
                                                     plan_blocks)


def _data(rng, B=2, H=2, Nq=64, Nk=256, D=32):
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)), jnp.float32)
    return q, k, v


def _object_blocked(rng, B, Nq, Nk, n_objects=4, p_extra=0.05):
    """Late-layer-like pattern: each query attends to one contiguous
    object span plus a little salt — most (q, kv) tiles fully blocked."""
    blocked = np.ones((B, Nq, Nk), bool)
    for b in range(B):
        spans = np.sort(rng.integers(0, Nk, 2 * n_objects)).reshape(-1, 2)
        for qi in range(Nq):
            s, e = spans[qi % n_objects]
            blocked[b, qi, s:e + 1] = False
    blocked &= rng.random((B, Nq, Nk)) > p_extra
    # No fully-blocked rows (callers apply the unblock fixup upstream).
    blocked[..., 0] = False
    return jnp.asarray(blocked)


def test_plan_blocks_counts_and_indices():
    B, Nq, Nk = 1, 8, 512
    blocked = np.ones((B, Nq, Nk), bool)
    blocked[:, :, 256:384] = False          # kv-block 1 of 4 live (bk=128)
    blocked[:, 0, 10] = False               # plus block 0 for row 0
    mask_i8, kv_idx, count = plan_blocks(jnp.asarray(blocked), 8, 128,
                                         8, 512)
    count = np.asarray(count)
    kv_idx = np.asarray(kv_idx)
    assert count.shape == (1, 1) and count[0, 0] == 2
    assert list(kv_idx[0, 0]) == [0, 2, 2, 2]  # live first, then repeat
    assert mask_i8.dtype == jnp.int8


def test_plan_blocks_padding_is_blocked():
    blocked = jnp.zeros((1, 5, 130), bool)   # everything live, odd sizes
    mask_i8, kv_idx, count = plan_blocks(blocked, 8, 128, 8, 256)
    assert int(count[0, 0]) == 2             # both kv blocks partly live
    m = np.asarray(mask_i8)
    assert m[:, 5:, :].all() and m[:, :, 130:].all()
    assert not m[:, :5, :130].any()


@pytest.mark.parametrize("shape", [(1, 2, 64, 256, 32),
                                   (2, 4, 200, 3 * 16 * 32, 96)])
def test_sparse_forward_parity(rng, shape):
    B, H, Nq, Nk, D = shape
    q, k, v = _data(rng, B, H, Nq, Nk, D)
    blocked = _object_blocked(np.random.default_rng(0), B, Nq, Nk)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_masked_mha(q, k, v, blocked)
    ref = dot_product_attention(q, k, v, mask=~blocked[:, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_sparse_forward_dense_mask(rng):
    """Fully-live mask (early layers): must equal unmasked attention."""
    q, k, v = _data(rng, 1, 2, 32, 384, 32)
    blocked = jnp.zeros((1, 32, 384), bool)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_masked_mha(q, k, v, blocked)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_sparse_fully_blocked_rows_zero(rng):
    q, k, v = _data(rng, 1, 1, 16, 128, 32)
    blocked = jnp.ones((1, 16, 128), bool).at[:, :8, :64].set(False)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_masked_mha(q, k, v, blocked)
    np.testing.assert_allclose(np.asarray(out[:, :, 8:]), 0.0, atol=1e-6)
    ref = dot_product_attention(q[:, :, :8], k[:, :, :64], v[:, :, :64])
    np.testing.assert_allclose(np.asarray(out[:, :, :8]), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_sparse_backward_matches_dense(rng):
    q, k, v = _data(rng, 1, 2, 32, 256, 32)
    blocked = _object_blocked(np.random.default_rng(1), 1, 32, 256)
    g = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(
            functools.partial(pallas_masked_mha, blocked=blocked), q, k, v)
        dq, dk, dv = vjp(g)
    _, ref_vjp = jax.vjp(
        lambda q, k, v: dot_product_attention(q, k, v,
                                              mask=~blocked[:, None]),
        q, k, v)
    for ours, theirs, name in zip((dq, dk, dv), ref_vjp(g),
                                  ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                                   rtol=2e-2, atol=2e-2, err_msg=name)


def test_mask_transformer_sparse_path_matches_fallback(rng, monkeypatch):
    """Forced kernel path through the full MaskTransformer == jnp path."""
    from panst3r_tpu.models.mask_transformer import (MaskTransformer,
                                                     MaskTransformerConfig)
    import panst3r_tpu.ops.attention as attn_mod

    c = MaskTransformerConfig(hidden_dim=64, ff_dim=64, mask_dim=32,
                              num_queries=16, num_heads=2, dec_layers=2,
                              lang_dim=32, fpn_dims=(64,))
    model = MaskTransformer(c)
    B, V, gh, gw = 1, 2, 8, 16
    f = jnp.asarray(rng.standard_normal((B, V, gh, gw, 64)), jnp.float32)
    mf = jnp.asarray(rng.standard_normal((B, V, gh * 2, gw * 2, 32)),
                     jnp.float32)
    cls_emb = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    portrait = jnp.zeros((B, V), bool)
    params = model.init(jax.random.PRNGKey(0), [f], mf, cls_emb, portrait)

    ref = model.apply(params, [f], mf, cls_emb, portrait)
    monkeypatch.setattr(attn_mod, "_use_pallas", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        out = model.apply(params, [f], mf, cls_emb, portrait)

    np.testing.assert_allclose(np.asarray(out["pred_masks"]),
                               np.asarray(ref["pred_masks"]),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               np.asarray(ref["pred_logits"]),
                               rtol=5e-3, atol=5e-3)
