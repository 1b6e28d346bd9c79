"""Panoptic Quality (PQ) evaluation.

The reference publishes PQ numbers (README.md:126-133) but contains NO eval
harness (train.py:290 is a TODO — SURVEY.md §4); this module supplies it.
Standard panopticapi-style PQ extended to multi-view scenes: a segment is
the union of its pixels across all V views of a scene (the reference's
"direct multi-view prediction" protocol, README.md:124), IoU computed over
scene voxels-of-pixels jointly, match iff IoU > 0.5 (provably unique).

PQ = Σ_TP IoU / (|TP| + |FP|/2 + |FN|/2),  SQ = Σ IoU/|TP|,  RQ = F1.
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
    *_segments: [{'id', 'category_id'}].  Accumulates per_class in place.
    """
    if per_class is None:
        per_class = defaultdict(PQStat)

    pred_cat = {s["id"]: s["category_id"] for s in pred_segments}
    gt_cat = {s["id"]: s["category_id"] for s in gt_segments}

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
        if gt_cat.get(g) != pred_cat.get(p):
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

    for g, cat in gt_cat.items():
        if g in matched_gt or gt_area.get(g, 0) == 0:
            continue
        per_class[cat].fn += 1
    for p, cat in pred_cat.items():
        if p in matched_pred:
            continue
        # Predictions mostly covering void are ignored (panopticapi rule).
        void_overlap = inter.get((VOID, p), 0)
        area = pred_area.get(p, 0)
        if area == 0 or void_overlap / max(area, 1) > 0.5:
            continue
        per_class[cat].fp += 1

    total = PQStat()
    for st in per_class.values():
        total += st
    return total


def summarize(per_class: dict[int, PQStat]) -> dict:
    total = PQStat()
    for st in per_class.values():
        total += st
    n = sum(1 for st in per_class.values() if st.tp + st.fp + st.fn > 0)
    pq_avg = (sum(st.pq for st in per_class.values()
                  if st.tp + st.fp + st.fn > 0) / n) if n else 0.0
    return {"PQ": 100.0 * pq_avg, "SQ": 100.0 * total.sq,
            "RQ": 100.0 * total.rq, "PQ_agg": 100.0 * total.pq,
            "num_classes": n}


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
                          class_set: list[str], classes: list[str]):
    """Build (gt_pan, gt_segments) from dataset instance/class maps."""
    class2id = {c: i for i, c in enumerate(classes)}
    segments = []
    for iid in np.unique(inst_ids):
        if iid == 0:
            continue
        m = inst_ids == iid
        local = int(cls_ids[m][0])
        segments.append({"id": int(iid),
                         "category_id": class2id[class_set[local]]})
    return inst_ids.astype(np.int64), segments
