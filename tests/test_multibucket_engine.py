"""Mixed-bucket end-to-end inference tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.core.bucketing import Bucket
from panst3r_tpu.engine.inference import InferenceEngine, MultiBucketEngine

from tests.test_inference import _setup
from tests.test_train import GRID, H, NCLS, W


def test_multibucket_single_bucket_matches_engine(rng):
    model, params, images, portrait, cls_emb = _setup(rng, V=4)
    single = InferenceEngine(model, params, Bucket(H, W), num_keyframes=2,
                             chunk=2, amp=False)
    multi = MultiBucketEngine(model, params, num_keyframes=2, chunk=2,
                              amp=False)
    a = single.run(images, portrait, cls_emb)
    b = multi.run(list(images), portrait, cls_emb)
    assert a["keyframes"] == b["keyframes"]
    np.testing.assert_allclose(np.stack(b["pointmaps_raw"]),
                               a["pointmaps_raw"], atol=2e-4)
    np.testing.assert_allclose(b["pred_logits"], a["pred_logits"],
                               atol=2e-3)
    np.testing.assert_allclose(np.stack(b["pred_masks"]), a["pred_masks"],
                               atol=1e-2, rtol=1e-2)


def test_multibucket_mixed_shapes(rng):
    model, params, _, _, cls_emb = _setup(rng, V=2)
    H2, W2 = 32, 32  # second (square) bucket
    images = [
        (rng.standard_normal((H, W, 3)) * 0.2).astype(np.float32),
        (rng.standard_normal((H2, W2, 3)) * 0.2).astype(np.float32),
        (rng.standard_normal((H, W, 3)) * 0.2).astype(np.float32),
        (rng.standard_normal((H2, W2, 3)) * 0.2).astype(np.float32),
    ]
    portrait = np.zeros(4, bool)
    multi = MultiBucketEngine(model, params, num_keyframes=3, chunk=2,
                              amp=False)
    out = multi.run(images, portrait, cls_emb)
    assert len(out["pointmaps_raw"]) == 4
    assert out["pointmaps_raw"][0].shape == (H, W, 7)
    assert out["pointmaps_raw"][1].shape == (H2, W2, 7)
    assert out["pred_masks"][0].shape[-2:] == (H // 2, W // 2)
    assert out["pred_masks"][1].shape[-2:] == (H2 // 2, W2 // 2)
    for pm in out["pointmaps_raw"]:
        assert np.isfinite(pm).all()
    for m in out["pred_masks"]:
        assert np.isfinite(m).all()
    assert np.isfinite(out["pred_logits"]).all()
