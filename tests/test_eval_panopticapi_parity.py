"""scene_pq vs a direct transcription of panopticapi's matcher.

The published PQ protocol (reference README.md:124-129) is panopticapi's
``pq_compute``.  panopticapi is not installed here (no network), so this
test transcribes its per-image matching core (``pq_compute_single_core``,
github.com/cocodataset/panopticapi evaluation.py) and its per-class
averaging (``pq_average``) verbatim, then checks panst3r_tpu's scene_pq /
summarize produce IDENTICAL per-class tp/fp/fn/iou and summary numbers on
randomized crowd- and void-bearing scenes.  This is a clearly-labeled
golden transcription for protocol parity, not model code.
"""
from collections import defaultdict

import numpy as np
import pytest

from panst3r_tpu.engine.eval import PQStat, scene_pq, summarize

VOID = 0
OFFSET = 256 * 256 * 256


class _RefStat:
    def __init__(self):
        self.iou = 0.0
        self.tp = 0
        self.fp = 0
        self.fn = 0


def ref_pq_single(pan_gt, pan_pred, gt_segms, pred_segms, pq_stat):
    """Transcription of panopticapi pq_compute_single_core (areas computed
    from the maps — identical to annotation areas for well-formed data)."""
    pan_gt = pan_gt.astype(np.uint64)
    pan_pred = pan_pred.astype(np.uint64)

    gt_area = defaultdict(int)
    for lab, cnt in zip(*np.unique(pan_gt, return_counts=True)):
        gt_area[int(lab)] = int(cnt)
    pred_area = defaultdict(int)
    for lab, cnt in zip(*np.unique(pan_pred, return_counts=True)):
        pred_area[int(lab)] = int(cnt)

    pan_gt_pred = pan_gt * OFFSET + pan_pred
    gt_pred_map = {}
    labels, labels_cnt = np.unique(pan_gt_pred, return_counts=True)
    for label, intersection in zip(labels, labels_cnt):
        gt_id = int(label // OFFSET)
        pred_id = int(label % OFFSET)
        gt_pred_map[(gt_id, pred_id)] = int(intersection)

    gt_matched = set()
    pred_matched = set()
    for label_tuple, intersection in gt_pred_map.items():
        gt_label, pred_label = label_tuple
        if gt_label not in gt_segms:
            continue
        if pred_label not in pred_segms:
            continue
        if gt_segms[gt_label]["iscrowd"] == 1:
            continue
        if gt_segms[gt_label]["category_id"] != \
                pred_segms[pred_label]["category_id"]:
            continue
        union = (pred_area[pred_label] + gt_area[gt_label] - intersection
                 - gt_pred_map.get((VOID, pred_label), 0))
        iou = intersection / union
        if iou > 0.5:
            cat = gt_segms[gt_label]["category_id"]
            pq_stat[cat].tp += 1
            pq_stat[cat].iou += iou
            gt_matched.add(gt_label)
            pred_matched.add(pred_label)

    crowd_labels_dict = {}
    for gt_label, gt_info in gt_segms.items():
        if gt_label in gt_matched:
            continue
        if gt_info["iscrowd"] == 1:
            crowd_labels_dict[gt_info["category_id"]] = gt_label
            continue
        pq_stat[gt_info["category_id"]].fn += 1

    for pred_label, pred_info in pred_segms.items():
        if pred_label in pred_matched:
            continue
        intersection = gt_pred_map.get((VOID, pred_label), 0)
        if pred_info["category_id"] in crowd_labels_dict:
            intersection += gt_pred_map.get(
                (crowd_labels_dict[pred_info["category_id"]], pred_label), 0)
        if intersection / pred_area[pred_label] > 0.5:
            continue
        pq_stat[pred_info["category_id"]].fp += 1
    return pq_stat


def ref_pq_average(pq_stat, categories):
    """Transcription of panopticapi pq_average."""
    pq, sq, rq, n = 0.0, 0.0, 0.0, 0
    for cat in categories:
        st = pq_stat[cat]
        if st.tp + st.fp + st.fn == 0:
            continue
        n += 1
        pq_c = st.iou / (st.tp + 0.5 * st.fp + 0.5 * st.fn)
        sq_c = st.iou / st.tp if st.tp != 0 else 0.0
        rq_c = st.tp / (st.tp + 0.5 * st.fp + 0.5 * st.fn)
        pq += pq_c
        sq += sq_c
        rq += rq_c
    if n == 0:
        return {"pq": 0.0, "sq": 0.0, "rq": 0.0, "n": 0}
    return {"pq": pq / n, "sq": sq / n, "rq": rq / n, "n": n}


def _random_scene(rng, n_cats=6, crowd_frac=0.3, hw=(24, 32), views=2):
    """Voronoi-ish random panoptic maps with void holes + crowd GT."""
    H, W = hw
    n_gt = int(rng.integers(3, 8))
    n_pred = int(rng.integers(3, 8))

    def seg_map(n, start_id):
        cy = rng.uniform(0, H, n)
        cx = rng.uniform(0, W, n)
        yy, xx = np.mgrid[0:H, 0:W]
        d = (yy[..., None] - cy) ** 2 + (xx[..., None] - cx) ** 2
        m = d.argmin(-1) + start_id
        return np.stack([m] * views)          # same partition per view

    gt = seg_map(n_gt, 1)
    # void holes
    hole = rng.random((views, H, W)) < 0.15
    gt[hole] = VOID

    pred = seg_map(n_pred, 1)
    # jitter pred vs gt: shift one view's partition
    pred[1:] = np.roll(pred[1:], shift=int(rng.integers(0, 4)), axis=2)
    pred[rng.random((views, H, W)) < 0.05] = VOID

    gt_segms = {}
    for i in range(1, n_gt + 1):
        gt_segms[i] = {"category_id": int(rng.integers(0, n_cats)),
                       "iscrowd": int(rng.random() < crowd_frac)}
    pred_segms = {}
    for i in range(1, n_pred + 1):
        pred_segms[i] = {"category_id": int(rng.integers(0, n_cats))}
    return gt, pred, gt_segms, pred_segms


@pytest.mark.parametrize("seed", range(8))
def test_scene_pq_matches_panopticapi(seed):
    rng = np.random.default_rng(seed)
    n_cats = 6
    ref_stat = defaultdict(_RefStat)
    per_class = defaultdict(PQStat)

    for _ in range(3):  # accumulate several scenes like a real eval run
        gt, pred, gt_segms, pred_segms = _random_scene(rng, n_cats)
        ref_pq_single(gt, pred, gt_segms, pred_segms, ref_stat)
        gt_list = [{"id": i, **info} for i, info in gt_segms.items()]
        pred_list = [{"id": i, "category_id": info["category_id"]}
                     for i, info in pred_segms.items()]
        scene_pq(pred, pred_list, gt, gt_list, per_class)

    for cat in range(n_cats):
        r, o = ref_stat[cat], per_class[cat]
        assert (r.tp, r.fp, r.fn) == (o.tp, o.fp, o.fn), (cat, seed)
        np.testing.assert_allclose(r.iou, o.iou_sum, rtol=1e-12)

    ref_all = ref_pq_average(ref_stat, range(n_cats))
    things = set(range(n_cats // 2))
    ref_th = ref_pq_average(ref_stat, sorted(things))
    ref_st = ref_pq_average(ref_stat, sorted(set(range(n_cats)) - things))

    s = summarize(per_class, things=things)
    np.testing.assert_allclose(s["PQ"], 100 * ref_all["pq"], rtol=1e-12)
    np.testing.assert_allclose(s["SQ"], 100 * ref_all["sq"], rtol=1e-12)
    np.testing.assert_allclose(s["RQ"], 100 * ref_all["rq"], rtol=1e-12)
    assert s["num_classes"] == ref_all["n"]
    np.testing.assert_allclose(s["PQ_th"], 100 * ref_th["pq"], rtol=1e-12)
    np.testing.assert_allclose(s["PQ_st"], 100 * ref_st["pq"], rtol=1e-12)
    assert s["N_th"] == ref_th["n"] and s["N_st"] == ref_st["n"]


def test_multiple_crowd_same_category_overwrite_quirk():
    """panopticapi keeps only the LAST crowd segment per category in its
    ignore rule — scene_pq must replicate (protocol parity over 'fixing'
    it)."""
    gt = np.zeros((1, 10, 12), np.int64)
    gt[:, :5, :6] = 1           # crowd A, cat 0
    gt[:, :5, 6:] = 2           # crowd B, cat 0 (later → wins the dict slot)
    gt_segms = {1: {"category_id": 0, "iscrowd": 1},
                2: {"category_id": 0, "iscrowd": 1}}
    # pred fully inside crowd A: panopticapi only credits overlap with
    # crowd B (the dict survivor) → NOT ignored → FP.
    pred = np.zeros((1, 10, 12), np.int64)
    pred[:, :5, :6] = 7
    pred_segms = {7: {"category_id": 0}}

    ref_stat = defaultdict(_RefStat)
    ref_pq_single(gt, pred, gt_segms, pred_segms, ref_stat)
    assert ref_stat[0].fp == 1          # the quirk, in the transcription

    per_class = defaultdict(PQStat)
    scene_pq(pred, [{"id": 7, "category_id": 0}],
             gt, [{"id": 1, "category_id": 0, "iscrowd": 1},
                  {"id": 2, "category_id": 0, "iscrowd": 1}], per_class)
    assert per_class[0].fp == 1         # replicated
