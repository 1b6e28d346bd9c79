"""PQ metric tests."""
from collections import defaultdict

import numpy as np

from panst3r_tpu.engine.eval import (PQStat, gt_segments_from_maps, scene_pq,
                                     summarize)


def test_perfect_prediction_pq_1():
    pan = np.zeros((2, 8, 8), np.int64)
    pan[:, :4, :4] = 1
    pan[:, 4:, 4:] = 2
    segs = [{"id": 1, "category_id": 3}, {"id": 2, "category_id": 5}]
    per_class = defaultdict(PQStat)
    scene_pq(pan, segs, pan, segs, per_class)
    s = summarize(per_class)
    assert abs(s["PQ"] - 100.0) < 1e-6
    assert abs(s["RQ"] - 100.0) < 1e-6


def test_missed_and_spurious_segments():
    gt = np.zeros((1, 8, 8), np.int64)
    gt[:, :4, :] = 1
    gt_segs = [{"id": 1, "category_id": 0}]
    pred = np.zeros((1, 8, 8), np.int64)
    pred[:, 6:, :] = 7          # spurious, in void region but small overlap
    pred_segs = [{"id": 7, "category_id": 0}]
    per_class = defaultdict(PQStat)
    scene_pq(pred, pred_segs, gt, gt_segs, per_class)
    s = per_class[0]
    assert s.tp == 0 and s.fn == 1
    # pred 7 lies fully in void → ignored, not FP (panopticapi rule)
    assert s.fp == 0


def test_wrong_class_no_match():
    pan = np.zeros((1, 8, 8), np.int64)
    pan[:, :4, :] = 1
    g = [{"id": 1, "category_id": 0}]
    p = [{"id": 1, "category_id": 2}]
    per_class = defaultdict(PQStat)
    scene_pq(pan, p, pan, g, per_class)
    assert per_class[0].fn == 1
    assert per_class[2].fp == 1


def test_partial_overlap_iou_threshold():
    gt = np.zeros((1, 10, 10), np.int64)
    gt[:, :, :6] = 1
    g = [{"id": 1, "category_id": 1}]
    p = [{"id": 9, "category_id": 1}]

    # panopticapi union: gt_area + pred_area − inter − (void ∩ pred).
    pred = np.zeros((1, 10, 10), np.int64)
    pred[:, :, 3:9] = 9         # inter 30, void∩pred 30 → IoU = 30/60 = 0.5
    per_class = defaultdict(PQStat)
    scene_pq(pred, p, gt, g, per_class)
    assert per_class[1].tp == 0  # 0.5 is NOT > 0.5

    pred2 = np.zeros((1, 10, 10), np.int64)
    pred2[:, :, 2:8] = 9        # inter 40, void∩pred 20 → IoU = 40/60 > 0.5
    per_class = defaultdict(PQStat)
    scene_pq(pred2, p, gt, g, per_class)
    assert per_class[1].tp == 1
    np.testing.assert_allclose(per_class[1].iou_sum, 40 / 60, rtol=1e-6)


def test_gt_segments_from_maps():
    inst = np.zeros((1, 4, 4), np.int64)
    inst[:, :2, :2] = 3
    cls = np.zeros((1, 4, 4), np.int64)
    cls[:, :2, :2] = 1
    pan, segs = gt_segments_from_maps(inst, cls, ["wall", "chair"],
                                      ["chair", "wall", "floor"])
    assert segs == [{"id": 3, "category_id": 0, "iscrowd": 0}]
    _, segs_c = gt_segments_from_maps(inst, cls, ["wall", "chair"],
                                      ["chair", "wall", "floor"],
                                      crowd_inst_ids=[3])
    assert segs_c == [{"id": 3, "category_id": 0, "iscrowd": 1}]


def test_crowd_gt_not_fn_and_absorbs_preds():
    # Crowd GT: never matched, never FN; unmatched preds mostly covering
    # the same-class crowd region are ignored (panopticapi rules).
    gt = np.zeros((1, 10, 10), np.int64)
    gt[:, :5, :] = 1            # crowd segment, class 2
    g = [{"id": 1, "category_id": 2, "iscrowd": 1}]
    pred = np.zeros((1, 10, 10), np.int64)
    pred[:, :5, :6] = 4         # fully inside crowd, same class
    pred[:, 7:, :] = 5          # in void
    p = [{"id": 4, "category_id": 2}, {"id": 5, "category_id": 2}]
    per_class = defaultdict(PQStat)
    scene_pq(pred, p, gt, g, per_class)
    st = per_class[2]
    assert st.tp == 0 and st.fn == 0 and st.fp == 0


def test_crowd_different_class_still_fp():
    gt = np.zeros((1, 10, 10), np.int64)
    gt[:, :5, :] = 1
    g = [{"id": 1, "category_id": 2, "iscrowd": 1}]
    pred = np.zeros((1, 10, 10), np.int64)
    pred[:, :5, :6] = 4         # inside crowd but DIFFERENT class → FP
    p = [{"id": 4, "category_id": 3}]
    per_class = defaultdict(PQStat)
    scene_pq(pred, p, gt, g, per_class)
    assert per_class[3].fp == 1


def test_things_stuff_split():
    pan = np.zeros((1, 8, 8), np.int64)
    pan[:, :4, :] = 1
    pan[:, 4:, :] = 2
    segs = [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 5}]
    per_class = defaultdict(PQStat)
    scene_pq(pan, segs, pan, segs, per_class)
    s = summarize(per_class, things={0})
    assert s["N_th"] == 1 and s["N_st"] == 1
    assert abs(s["PQ_th"] - 100.0) < 1e-6
    assert abs(s["PQ_st"] - 100.0) < 1e-6
