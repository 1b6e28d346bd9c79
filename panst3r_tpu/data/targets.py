"""Host-side target preparation for the panoptic criterion.

Equivalent of the reference's `PanopticLoss._prepare_targets`
(/root/reference/src/panst3r/criterion/losses.py:63-106): per-sample
instance-id / class-id maps → binary per-instance multi-view masks + global
class labels + per-dataset `output_mask`.  Here the output is padded to a
static ``max_instances`` (SURVEY.md §7 hard part 4) so the jitted criterion
sees fixed shapes; runs in the data loader on CPU (numpy).
"""
from __future__ import annotations

import numpy as np


def prepare_targets(inst_ids: np.ndarray, cls_ids: np.ndarray,
                    class_set: list[str], classes: list[str],
                    max_instances: int):
    """inst_ids/cls_ids: (V, H, W) int maps for one sample; ``class_set``:
    names indexed by the local cls ids; ``classes``: the global vocabulary.

    Returns dict of padded arrays: labels (T,), masks (T, V, H, W) float32,
    valid (T,), output_mask (ncls,).
    """
    class2id = {c: i for i, c in enumerate(classes)}
    V, H, W = inst_ids.shape
    labels = np.zeros(max_instances, np.int32)
    masks = np.zeros((max_instances, V, H, W), np.float32)
    valid = np.zeros(max_instances, bool)

    t = 0
    for iid in np.unique(inst_ids):
        if iid == 0:
            continue
        mask = inst_ids == iid
        label_all = cls_ids[mask]
        assert (label_all == label_all[0]).all(), \
            f"different classes within instance id={iid}"  # losses.py:86
        if t >= max_instances:
            break  # overflow instances are dropped (rare; bump max_instances)
        labels[t] = class2id[class_set[label_all[0]]]
        masks[t] = mask
        valid[t] = True
        t += 1

    output_mask = np.isin(np.asarray(classes), np.asarray(class_set))
    return {"labels": labels, "masks": masks, "valid": valid,
            "output_mask": output_mask}
