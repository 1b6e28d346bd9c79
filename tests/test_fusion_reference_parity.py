"""Fusion parity vs a direct (slow) reimplementation of the reference loop.

The reference's fusion is a sequential per-query Python loop
(postprocess.py:66-119).  This test writes that loop directly in numpy
(from its specification) and checks our vectorized on-device fusion
produces identical segment maps and metadata on random inputs — the
PQ-sensitive behavior (SURVEY.md §7 hard part 5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.engine.fusion import panoptic_fusion


def reference_fusion_loop(mask_cls, mask_pred, hw, cls_threshold=0.1,
                          mask_threshold=0.25, overlap_threshold=0.5,
                          niters=2, void_confidence=0.1):
    """Direct transcription of the reference algorithm (sequential)."""
    H, W = hw
    B, V, Q = mask_pred.shape[:3]
    results = []
    for b in range(B):
        # sigmoid then bilinear upsample (order matters)
        m = 1 / (1 + np.exp(-mask_pred[b].astype(np.float64)))
        masks = np.asarray(jax.image.resize(jnp.asarray(m), (V, Q, H, W),
                                            method="bilinear"))
        masks = masks.transpose(1, 0, 2, 3)          # (Q, V, H, W)
        probs = 1 / (1 + np.exp(-mask_cls[b].astype(np.float64)))
        scores = probs.max(-1)
        labels = probs.argmax(-1)
        keep = scores > cls_threshold

        cur_scores = scores[keep]
        cur_classes = labels[keep]
        cur_masks = masks[keep]
        cur_indices = np.arange(Q)[keep]
        cur_prob_masks = cur_scores[:, None, None, None] * cur_masks

        pan = np.zeros((V, H, W), np.int32)
        conf = np.full((V, H, W), void_confidence, np.float64)
        segments = []
        for it in range(niters):
            pan = np.zeros((V, H, W), np.int32)
            conf = np.full((V, H, W), void_confidence, np.float64)
            segments = []
            if cur_masks.shape[0] == 0:
                break
            cur_mask_ids = cur_prob_masks.argmax(0)
            seg_id = 0
            selected = []
            for k in range(cur_classes.shape[0]):
                orig_area = (cur_masks[k] >= 0.5).sum()
                mask = (cur_mask_ids == k) & (cur_masks[k] >= mask_threshold)
                area = mask.sum()
                if area > 0 and orig_area > 0:
                    if area / orig_area < overlap_threshold:
                        continue
                    selected.append(k)
                    seg_id += 1
                    pan[mask] = seg_id
                    conf[mask] = cur_masks[k][mask]
                    segments.append({"id": seg_id,
                                     "query_id": int(cur_indices[k]),
                                     "category_id": int(cur_classes[k])})
            sel = np.asarray(selected, int)
            cur_prob_masks = cur_prob_masks[sel]
            cur_classes = cur_classes[sel]
            cur_indices = cur_indices[sel]
            cur_masks = cur_masks[sel]
        results.append({"pan": pan, "segments_info": segments,
                        "conf": conf})
    return results


@pytest.mark.parametrize("niters", [1, 2])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fusion_matches_reference_loop(seed, niters):
    rng = np.random.default_rng(seed)
    B, V, Q, h, w, NC = 1, 2, 16, 12, 16, 6
    H, W = 24, 32
    mask_cls = (rng.standard_normal((B, Q, NC)) * 2).astype(np.float32)
    mask_pred = (rng.standard_normal((B, V, Q, h, w)) * 3).astype(np.float32)

    ours = panoptic_fusion(jnp.asarray(mask_cls), jnp.asarray(mask_pred),
                           (H, W), niters=niters)
    ref = reference_fusion_loop(mask_cls, mask_pred, (H, W), niters=niters)

    for o, r in zip(ours, ref):
        np.testing.assert_array_equal(o["pan"], r["pan"])
        assert o["segments_info"] == r["segments_info"]
        # conf agrees where assigned (f16 download rounding allowed)
        assigned = r["pan"] > 0
        np.testing.assert_allclose(o["conf"][assigned],
                                   r["conf"][assigned], atol=2e-3)
