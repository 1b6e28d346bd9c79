"""Panoptic Quality (PQ) evaluation.

The reference publishes PQ numbers (README.md:126-133) but contains NO eval
harness (train.py:290 is a TODO — SURVEY.md §4); this module supplies it.
Standard panopticapi-style PQ extended to multi-view scenes: a segment is
the union of its pixels across all V views of a scene (the reference's
"direct multi-view prediction" protocol, README.md:124), IoU computed over
scene voxels-of-pixels jointly, match iff IoU > 0.5 (provably unique).

PQ = Σ_TP IoU / (|TP| + |FP|/2 + |FN|/2),  SQ = Σ IoU/|TP|,  RQ = F1.

Matching follows panopticapi ``pq_compute_single_core`` exactly (the
protocol behind the published numbers — the reference's preprocessing maps
crowd classes, /root/reference/tools/preprocess_scannetpp.py:280-321):
- GT segments with ``iscrowd=1`` never match and are NOT counted as FN.
- An unmatched prediction is ignored (not FP) when more than half of its
  area lies on VOID plus the same-category crowd GT segment.  panopticapi
  keeps ONE crowd segment per category (dict insertion overwrite) — that
  quirk is replicated for exact parity (test_eval_panopticapi_parity.py).
- PQ/SQ/RQ are per-class averages over classes present in GT or
  predictions (panopticapi ``pq_average``); Things/Stuff splits average
  over the respective category subsets.
"""
from __future__ import annotations

import dataclasses
from collections import defaultdict

import numpy as np

VOID = 0


@dataclasses.dataclass
class PQStat:
    iou_sum: float = 0.0
    tp: int = 0
    fp: int = 0
    fn: int = 0

    def __iadd__(self, other):
        self.iou_sum += other.iou_sum
        self.tp += other.tp
        self.fp += other.fp
        self.fn += other.fn
        return self

    @property
    def pq(self) -> float:
        denom = self.tp + 0.5 * self.fp + 0.5 * self.fn
        return self.iou_sum / denom if denom else 0.0

    @property
    def sq(self) -> float:
        return self.iou_sum / self.tp if self.tp else 0.0

    @property
    def rq(self) -> float:
        denom = self.tp + 0.5 * self.fp + 0.5 * self.fn
        return self.tp / denom if denom else 0.0


def scene_pq(pred_pan: np.ndarray, pred_segments: list[dict],
             gt_pan: np.ndarray, gt_segments: list[dict],
             per_class: dict[int, PQStat] | None = None) -> PQStat:
    """pred_pan/gt_pan: (V, H, W) segment-id maps (0 = void);
    *_segments: [{'id', 'category_id'[, 'iscrowd']}].  Accumulates
    per_class in place.  Matching semantics = panopticapi
    ``pq_compute_single_core`` (see module docstring for the crowd rules).
    """
    if per_class is None:
        per_class = defaultdict(PQStat)

    pred_cat = {s["id"]: s["category_id"] for s in pred_segments}
    gt_cat = {s["id"]: s["category_id"] for s in gt_segments}
    gt_crowd = {s["id"] for s in gt_segments if s.get("iscrowd", 0)}

    pred_flat = pred_pan.reshape(-1).astype(np.int64)
    gt_flat = gt_pan.reshape(-1).astype(np.int64)

    # Joint histogram of (gt_id, pred_id) co-occurrence.
    combo = gt_flat * (pred_flat.max() + 2) + pred_flat
    vals, counts = np.unique(combo, return_counts=True)
    base = pred_flat.max() + 2
    inter = {(int(v // base), int(v % base)): int(c)
             for v, c in zip(vals, counts)}

    gt_area = defaultdict(int)
    pred_area = defaultdict(int)
    for (g, p), c in inter.items():
        gt_area[g] += c
        pred_area[p] += c

    matched_gt, matched_pred = set(), set()
    for (g, p), c in inter.items():
        if g == VOID or p == VOID:
            continue
        if g not in gt_cat or p not in pred_cat:
            continue
        if g in gt_crowd:      # crowd GT never matches (panopticapi)
            continue
        if gt_cat[g] != pred_cat[p]:
            continue
        # panopticapi rule: pred pixels on void GT don't count against the
        # union.
        union = gt_area[g] + pred_area[p] - c - inter.get((VOID, p), 0)
        iou = c / union if union else 0.0
        if iou > 0.5:
            cat = gt_cat[g]
            per_class[cat].iou_sum += iou
            per_class[cat].tp += 1
            matched_gt.add(g)
            matched_pred.add(p)

    # FN pass.  Crowd GT segments are never FN; panopticapi keeps ONE
    # crowd label per category (plain dict assignment — later segments
    # overwrite), replicated verbatim for protocol parity.
    crowd_by_cat: dict[int, int] = {}
    for s in gt_segments:
        g, cat = s["id"], s["category_id"]
        if g in matched_gt or gt_area.get(g, 0) == 0:
            continue
        if g in gt_crowd:
            crowd_by_cat[cat] = g
            continue
        per_class[cat].fn += 1

    for p, cat in pred_cat.items():
        if p in matched_pred:
            continue
        # Predictions mostly covering void + the same-category crowd
        # segment are ignored (panopticapi rule).
        ignored = inter.get((VOID, p), 0)
        if cat in crowd_by_cat:
            ignored += inter.get((crowd_by_cat[cat], p), 0)
        area = pred_area.get(p, 0)
        if area == 0 or ignored / area > 0.5:
            continue
        per_class[cat].fp += 1

    total = PQStat()
    for st in per_class.values():
        total += st
    return total


def _pq_average(per_class: dict[int, PQStat],
                cats: set[int] | None = None) -> dict:
    """panopticapi ``pq_average``: PQ/SQ/RQ are per-class means over
    classes with tp+fp+fn > 0 (optionally restricted to ``cats``)."""
    sel = [st for c, st in per_class.items()
           if (cats is None or c in cats) and st.tp + st.fp + st.fn > 0]
    n = len(sel)
    if not n:
        return {"pq": 0.0, "sq": 0.0, "rq": 0.0, "n": 0}
    return {"pq": sum(st.pq for st in sel) / n,
            "sq": sum(st.sq for st in sel) / n,
            "rq": sum(st.rq for st in sel) / n, "n": n}


def summarize(per_class: dict[int, PQStat],
              things: set[int] | None = None) -> dict:
    """PQ/SQ/RQ per panopticapi averaging; with ``things`` (the set of
    thing category ids) also reports the Things/Stuff splits the published
    protocol tables use (reference README.md:126-129)."""
    total = PQStat()
    for st in per_class.values():
        total += st
    avg = _pq_average(per_class)
    out = {"PQ": 100.0 * avg["pq"], "SQ": 100.0 * avg["sq"],
           "RQ": 100.0 * avg["rq"], "PQ_agg": 100.0 * total.pq,
           "num_classes": avg["n"]}
    if things is not None:
        th = _pq_average(per_class, things)
        st_cats = set(per_class) - set(things)
        stf = _pq_average(per_class, st_cats)
        out.update({"PQ_th": 100.0 * th["pq"], "SQ_th": 100.0 * th["sq"],
                    "RQ_th": 100.0 * th["rq"], "N_th": th["n"],
                    "PQ_st": 100.0 * stf["pq"], "SQ_st": 100.0 * stf["sq"],
                    "RQ_st": 100.0 * stf["rq"], "N_st": stf["n"]})
    return out


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = True):
    """Similarity transform (s, R, t) minimizing ‖s·R·src + t − dst‖²."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var = (sc ** 2).sum() / len(src)
    s = float((D * np.diag(S)).sum() / var) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(pred_poses: np.ndarray, gt_poses: np.ndarray,
             align: bool = True, with_scale: bool = True) -> float:
    """Absolute trajectory error (RMSE of camera centers) after optional
    Umeyama alignment — the trajectory metric the BASELINE requires that
    the reference never reports (demo recovers poses but has no eval)."""
    p = pred_poses[:, :3, 3]
    g = gt_poses[:, :3, 3]
    if align:
        s, R, t = umeyama_alignment(p, g, with_scale)
        p = (s * (R @ p.T)).T + t
    return float(np.sqrt(((p - g) ** 2).sum(-1).mean()))


def gt_segments_from_maps(inst_ids: np.ndarray, cls_ids: np.ndarray,
                          class_set: list[str], classes: list[str],
                          crowd_inst_ids=None):
    """Build (gt_pan, gt_segments) from dataset instance/class maps.
    ``crowd_inst_ids``: instance ids annotated as crowd (ScanNet++
    preprocessing exports them when run with --export-crowd; reference
    crowd CSV preprocess_scannetpp.py:280-321) — marked ``iscrowd=1`` so
    scene_pq applies the panopticapi crowd rules."""
    class2id = {c: i for i, c in enumerate(classes)}
    crowd = set(int(i) for i in crowd_inst_ids) if crowd_inst_ids is not None \
        else set()
    segments = []
    for iid in np.unique(inst_ids):
        if iid == 0:
            continue
        m = inst_ids == iid
        local = int(cls_ids[m][0])
        segments.append({"id": int(iid),
                         "category_id": class2id[class_set[local]],
                         "iscrowd": int(int(iid) in crowd)})
    return inst_ids.astype(np.int64), segments
