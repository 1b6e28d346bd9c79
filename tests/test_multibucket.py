"""Multi-bucket (multi-aspect-ratio) joint decoding tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.models.mask_transformer import (MaskTransformer,
                                                 MaskTransformerConfig)

MT = MaskTransformerConfig(hidden_dim=32, ff_dim=64, mask_dim=16,
                           num_queries=8, num_heads=4, dec_layers=2,
                           lang_dim=24, fpn_dims=(32,))


def _bucket_inputs(rng, B, V, gh, gw, mask_hw):
    fpn = jnp.asarray(rng.standard_normal((B, V, gh, gw, 32)), jnp.float32)
    mask_f = jnp.asarray(rng.standard_normal((B, V, *mask_hw, 16)),
                         jnp.float32)
    portrait = jnp.zeros((B, V), bool)
    return fpn, mask_f, portrait


def test_multibucket_joint_decode(rng):
    B, ncls = 1, 5
    cls_emb = jnp.asarray(rng.standard_normal((ncls, 24)), jnp.float32)
    f1, m1, p1 = _bucket_inputs(rng, B, 2, 2, 3, (16, 24))
    f2, m2, p2 = _bucket_inputs(rng, B, 1, 3, 3, (24, 24))

    model = MaskTransformer(MT)
    params = model.init(jax.random.PRNGKey(0), [[f1, f2]], [m1, m2],
                        cls_emb, [p1, p2])
    out = model.apply(params, [[f1, f2]], [m1, m2], cls_emb, [p1, p2])
    assert out["pred_logits"].shape == (B, 8, ncls)
    assert isinstance(out["pred_masks"], list) and len(out["pred_masks"]) == 2
    assert out["pred_masks"][0].shape == (B, 2, 8, 16, 24)
    assert out["pred_masks"][1].shape == (B, 1, 8, 24, 24)
    for a, b in zip(out["aux_outputs"][0]["pred_masks"], out["pred_masks"]):
        assert a.shape == b.shape


def test_single_bucket_equals_singleton_list(rng):
    B, ncls = 1, 5
    cls_emb = jnp.asarray(rng.standard_normal((ncls, 24)), jnp.float32)
    f1, m1, p1 = _bucket_inputs(rng, B, 2, 2, 3, (16, 24))

    model = MaskTransformer(MT)
    params = model.init(jax.random.PRNGKey(0), [f1], m1, cls_emb, p1)
    out_single = model.apply(params, [f1], m1, cls_emb, p1)
    out_list = model.apply(params, [[f1]], [m1], cls_emb, [p1])
    np.testing.assert_allclose(np.asarray(out_single["pred_logits"]),
                               np.asarray(out_list["pred_logits"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_single["pred_masks"]),
                               np.asarray(out_list["pred_masks"][0]),
                               atol=1e-5)
