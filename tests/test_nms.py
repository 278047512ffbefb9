"""NMS keep-set parity vs a numpy port of the reference greedy NMS
(/root/reference/utils/utils.py:150-184)."""

import jax.numpy as jnp
import numpy as np

from yolo_v1_tpu.core.nms import nms_keep_mask


def ref_nms_np(bboxes, scores, threshold):
    """Numpy port of the reference greedy NMS (utils/utils.py:150-184)."""
    x1, y1, x2, y2 = bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        xx1 = np.maximum(x1[order[1:]], x1[i])
        yy1 = np.maximum(y1[order[1:]], y1[i])
        xx2 = np.minimum(x2[order[1:]], x2[i])
        yy2 = np.minimum(y2[order[1:]], y2[i])
        w = np.maximum(xx2 - xx1, 0)
        h = np.maximum(yy2 - yy1, 0)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        ids = np.nonzero(ovr <= threshold)[0]
        if ids.size == 0:
            break
        order = order[ids + 1]
    return sorted(keep)


def make_boxes(rng, n):
    cxy = rng.uniform(0.1, 0.9, (n, 2))
    wh = rng.uniform(0.05, 0.4, (n, 2))
    return np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1).astype(np.float32)


def test_nms_matches_reference(rng):
    for trial in range(10):
        n = int(rng.integers(1, 60))
        boxes = make_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        for th in (0.25, 0.45, 0.5, 0.9):
            keep = nms_keep_mask(
                jnp.asarray(boxes),
                jnp.asarray(scores),
                jnp.ones(n, dtype=bool),
                iou_threshold=th,
            )
            got = sorted(np.flatnonzero(np.asarray(keep)).tolist())
            want = ref_nms_np(boxes, scores, th)
            assert got == want, f"trial={trial} th={th}"


def test_nms_invalid_candidates_never_kept(rng):
    n = 20
    boxes = make_boxes(rng, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.5
    keep = np.asarray(
        nms_keep_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            iou_threshold=0.5,
        )
    )
    assert not np.any(keep & ~valid)
    # Valid-only candidates behave like a dense reference run.
    idx = np.flatnonzero(valid)
    want = [idx[i] for i in ref_nms_np(boxes[idx], scores[idx], 0.5)]
    assert sorted(np.flatnonzero(keep).tolist()) == sorted(want)


def test_nms_identical_boxes_keep_best_only():
    boxes = np.tile(np.array([[0.1, 0.1, 0.5, 0.5]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    keep = np.asarray(
        nms_keep_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(4, bool),
            iou_threshold=0.5,
        )
    )
    assert keep.tolist() == [True, False, False, False]


def test_nms_threshold_one_keeps_all(rng):
    # gt decode path uses nms_thresh=1.0 which keeps everything
    # (utils/utils.py:143-146).
    boxes = make_boxes(rng, 10)
    scores = rng.uniform(0.01, 1.0, 10).astype(np.float32)
    keep = np.asarray(
        nms_keep_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(10, bool),
            iou_threshold=1.0,
        )
    )
    assert keep.all()


def test_class_aware_nms():
    # Same box, different classes: class-aware NMS keeps both.
    boxes = np.tile(np.array([[0.1, 0.1, 0.5, 0.5]], np.float32), (2, 1))
    scores = np.array([0.9, 0.8], np.float32)
    cls = jnp.asarray([0, 1])
    keep = np.asarray(
        nms_keep_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(2, bool),
            iou_threshold=0.5, class_ids=cls,
        )
    )
    assert keep.tolist() == [True, True]
