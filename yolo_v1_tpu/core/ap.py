"""VOC average-precision computation — host-side numpy.

AP is a tiny, inherently sequential reduction over a few thousand scalar
detections; it stays on host (the reference also runs it in numpy).  Exact
numeric parity with the reference:

* ``voc_ap`` — 11-point and "correct"/continuous AP
  (`/root/reference/utils/utils.py:215-238`).
* ``voc_eval`` — per-class TP/FP marking at IoU > threshold with the VOC
  "+1 pixel" intersection convention and greedy GT matching with removal
  (`/root/reference/utils/utils.py:240-319`).

One deliberate divergence: the reference *breaks out of the class loop* when
a class has zero predictions, assigning ap = -1 to it and silently dropping
every remaining class from the mean (utils/utils.py:248-255).  That is a
bug; by default we score such a class 0 and keep going.  Pass
``zero_pred_policy='reference_break'`` to reproduce the quirk bit-for-bit.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Mapping, Sequence

import numpy as np


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    """AP from recall/precision curves (reference utils/utils.py:215-238)."""
    rec = np.asarray(rec, dtype=np.float64)
    prec = np.asarray(prec, dtype=np.float64)
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            if np.sum(rec >= t) == 0:
                p = 0.0
            else:
                p = float(np.max(prec[rec >= t]))
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _iou_plus_one(bb: Sequence[float], bbgt: Sequence[float]) -> float:
    """IoU with the +1 convention (reference utils/utils.py:281-293)."""
    ixmin = max(bbgt[0], bb[0])
    iymin = max(bbgt[1], bb[1])
    ixmax = min(bbgt[2], bb[2])
    iymax = min(bbgt[3], bb[3])
    iw = max(ixmax - ixmin + 1.0, 0.0)
    ih = max(iymax - iymin + 1.0, 0.0)
    inter = iw * ih
    union = (
        (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
        + (bbgt[2] - bbgt[0] + 1.0) * (bbgt[3] - bbgt[1] + 1.0)
        - inter
    )
    return inter / union if union > 0 else 0.0


def voc_eval(
    preds: Mapping[str, list],
    target: Mapping[tuple, list],
    class_names: Sequence[str],
    iou_threshold: float = 0.5,
    use_07_metric: bool = False,
    zero_pred_policy: str = "zero",
    logger=None,
) -> tuple[float, dict[str, float]]:
    """Mean AP over classes (reference utils/utils.py:240-319).

    Args:
      preds: {class_name: [[image_id, confidence, x1, y1, x2, y2], ...]}.
      target: {(image_id, class_name): [[x1, y1, x2, y2], ...]}.
      class_names: evaluation classes, in order.
      iou_threshold: match threshold (reference default 0.5).
      use_07_metric: 11-point AP instead of continuous.
      zero_pred_policy: 'zero' (fixed: score 0, keep going) or
        'reference_break' (reproduce the reference's early break with -1).

    Returns:
      (mAP, {class_name: ap}).  Unlike the reference, neither input is
      mutated (the reference pops matched GT boxes from ``target`` in place,
      forcing callers to deepcopy — train.py:191,198).
    """
    # Local, mutable copy of GT so greedy matching-with-removal can't rematch
    # a box (reference utils/utils.py:296-298) without touching the caller.
    remaining: dict[tuple, list] = {k: [list(b) for b in v] for k, v in target.items()}
    npos_by_class: dict[str, float] = defaultdict(float)
    for (_img, cls), bxs in target.items():
        npos_by_class[cls] += len(bxs)

    aps: dict[str, float] = {}
    ap_list: list[float] = []
    for cls in class_names:
        pred = preds.get(cls, [])
        if len(pred) == 0:
            ap = -1.0 if zero_pred_policy == "reference_break" else 0.0
            aps[cls] = ap
            ap_list.append(ap)
            if logger:
                logger.info("---class %s ap %s---", cls, ap)
            if zero_pred_policy == "reference_break":
                break
            continue

        confidence = np.array([float(p[1]) for p in pred])
        sorted_ind = np.argsort(-confidence)
        image_ids = [pred[i][0] for i in sorted_ind]
        BB = np.array([p[2:] for p in pred], dtype=np.float64)[sorted_ind]

        npos = npos_by_class.get(cls, 0.0)
        if npos == 0:
            # Detections for a class with zero GT boxes: every one is a
            # false positive, so AP is 0.  Short-circuit instead of feeding
            # tp/eps recalls into voc_ap (the reference divides by zero
            # here, utils/utils.py:304 — same ~0 outcome, now explicit).
            aps[cls] = 0.0
            ap_list.append(0.0)
            if logger:
                logger.info("---class %s ap %s---", cls, 0.0)
            continue
        nd = len(image_ids)
        tp = np.zeros(nd)
        fp = np.zeros(nd)
        for d, image_id in enumerate(image_ids):
            bb = BB[d]
            key = (image_id, cls)
            gts = remaining.get(key)
            if gts:
                for bbgt in list(gts):
                    if _iou_plus_one(bb, bbgt) > iou_threshold:
                        tp[d] = 1
                        gts.remove(bbgt)
                        break
                fp[d] = 1 - tp[d]
            else:
                fp[d] = 1
        fp = np.cumsum(fp)
        tp = np.cumsum(tp)
        rec = tp / npos
        prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
        ap = voc_ap(rec, prec, use_07_metric)
        aps[cls] = ap
        ap_list.append(ap)
        if logger:
            logger.info("---class %s ap %s---", cls, ap)

    mAP = float(np.mean(ap_list)) if ap_list else 0.0
    if logger:
        logger.info("---map %s---", mAP)
    return mAP, aps
