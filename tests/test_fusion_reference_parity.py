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


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fusion_v1_thresholds_match_reference_loop(seed):
    """panoptic_inference_v1 semantics: mask_threshold=0.5,
    overlap_threshold=0.8, niters=1 (reference postprocess.py:9-11) —
    the v1-checkpoint threshold set VERDICT r2 #8 asked to pin."""
    from panst3r_tpu.engine.fusion import panoptic_fusion_v1

    rng = np.random.default_rng(100 + seed)
    B, V, Q, h, w, NC = 1, 2, 16, 12, 16, 6
    H, W = 24, 32
    mask_cls = (rng.standard_normal((B, Q, NC)) * 2).astype(np.float32)
    mask_pred = (rng.standard_normal((B, V, Q, h, w)) * 3).astype(np.float32)

    ours = panoptic_fusion_v1(jnp.asarray(mask_cls), jnp.asarray(mask_pred),
                              (H, W))
    ref = reference_fusion_loop(mask_cls, mask_pred, (H, W),
                                mask_threshold=0.5, overlap_threshold=0.8,
                                niters=1)

    for o, r in zip(ours, ref):
        np.testing.assert_array_equal(o["pan"], r["pan"])
        assert o["segments_info"] == r["segments_info"]
        # conf agrees where assigned (f16 download rounding allowed)
        assigned = r["pan"] > 0
        np.testing.assert_allclose(o["conf"][assigned],
                                   r["conf"][assigned], atol=2e-3)


def reference_fusion_multi_ar(mask_cls, mask_pred_views, true_shapes,
                              cls_threshold=0.1, mask_threshold=0.25,
                              overlap_threshold=0.5, niters=2,
                              void_confidence=0.1):
    """Transcription of the reference's nested-tensor multi-AR path
    (postprocess.py:17-27): sigmoid → per-view upsample to its true shape
    → zero-pad to max → the standard loop → crop (:124-126)."""
    import torch
    import torch.nn.functional as F

    Hm = max(h for h, _ in true_shapes)
    Wm = max(w for _, w in true_shapes)
    padded = []
    for m, (h, w) in zip(mask_pred_views, true_shapes):
        t = torch.sigmoid(torch.from_numpy(m.astype(np.float64))[None])
        t = F.interpolate(t, size=(h, w), mode="bilinear",
                          align_corners=False)[0]
        out = torch.zeros((m.shape[0], Hm, Wm), dtype=torch.float64)
        out[:, :h, :w] = t
        padded.append(out.numpy())
    masks = np.stack(padded)                       # (V, Q, Hm, Wm)

    Q = mask_cls.shape[0]
    probs = 1 / (1 + np.exp(-mask_cls.astype(np.float64)))
    scores, labels = probs.max(-1), probs.argmax(-1)
    keep = scores > cls_threshold

    masks = masks.transpose(1, 0, 2, 3)            # (Q, V, Hm, Wm)
    cur_scores, cur_classes = scores[keep], labels[keep]
    cur_masks = masks[keep]
    cur_indices = np.arange(Q)[keep]
    cur_prob_masks = cur_scores[:, None, None, None] * cur_masks

    V = len(true_shapes)
    pan = np.zeros((V, Hm, Wm), np.int32)
    conf = np.full((V, Hm, Wm), void_confidence, np.float64)
    segments = []
    for it in range(niters):
        pan = np.zeros((V, Hm, Wm), np.int32)
        conf = np.full((V, Hm, Wm), void_confidence, np.float64)
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
        cur_prob_masks, cur_classes = cur_prob_masks[sel], cur_classes[sel]
        cur_indices, cur_masks = cur_indices[sel], cur_masks[sel]

    return {"pan": [pan[i, :h, :w] for i, (h, w) in enumerate(true_shapes)],
            "segments_info": segments,
            "conf": [conf[i, :h, :w] for i, (h, w) in enumerate(true_shapes)]}


@pytest.mark.parametrize("seed", [0, 1])
def test_multi_ar_fusion_matches_reference(seed):
    from panst3r_tpu.engine.fusion import panoptic_fusion_multi_ar

    rng = np.random.default_rng(seed)
    Q, NC = 12, 5
    # three views in two different buckets
    shapes_lo = [(12, 16), (8, 16), (12, 16)]
    true_shapes = [(24, 32), (16, 32), (24, 32)]
    mask_cls = (rng.standard_normal((Q, NC)) * 2).astype(np.float32)
    views = [(rng.standard_normal((Q, h, w)) * 3).astype(np.float32)
             for h, w in shapes_lo]

    ours = panoptic_fusion_multi_ar(mask_cls, views, true_shapes)[0]
    ref = reference_fusion_multi_ar(mask_cls, views, true_shapes)

    assert ours["segments_info"] == ref["segments_info"]
    for o, r in zip(ours["pan"], ref["pan"]):
        np.testing.assert_array_equal(o, r)
    for o, r, (h, w) in zip(ours["conf"], ref["conf"], true_shapes):
        assigned = r > 0.2
        np.testing.assert_allclose(o[assigned], r[assigned], atol=2e-2)
