"""Greedy non-max suppression over a fixed candidate set — jit-able.

Exact keep-set parity with the reference greedy NMS
(`/root/reference/utils/utils.py:150-184`): sort by descending score, walk
the list, suppress any later box whose IoU with a kept box exceeds the
threshold (reference keeps ``ovr <= threshold``).  Areas use the geometric
convention (no +1 — reference :159).

The reference operates on a dynamic list; here the candidate count K is
static (K = S*S*B from the decoder) and invalid slots are masked, which is
what XLA wants.  The sequential data dependence of greedy NMS is expressed
as a ``lax.fori_loop`` over the sorted order (K is 98 for S=7, 392 for
S=14 — trivially cheap).  A Pallas TPU kernel with the same contract lives
in ``yolo_v1_tpu.ops.pallas.nms_kernel``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from yolo_v1_tpu.core.boxes import iou_matrix


def nms_keep_mask(
    boxes: Array,
    scores: Array,
    valid: Array,
    *,
    iou_threshold: float = 0.5,
    class_ids: Array | None = None,
) -> Array:
    """Boolean keep mask for greedy NMS over K candidates.

    Args:
      boxes: [K, 4] corner-format boxes.
      scores: [K] scores (higher = better).
      valid: [K] bool, candidates that exist at all.
      iou_threshold: suppress when IoU > threshold (reference utils.py:180).
      class_ids: optional [K] int — when given, suppression only applies
        within the same class (the reference is class-agnostic; pass None
        for reference parity).

    Returns:
      [K] bool keep mask (subset of ``valid``).
    """
    K = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked_scores)
    sboxes = jnp.take(boxes, order, axis=0)
    svalid = jnp.take(valid, order)
    iou = iou_matrix(sboxes, sboxes)
    if class_ids is not None:
        scls = jnp.take(class_ids, order)
        iou = jnp.where(scls[:, None] == scls[None, :], iou, 0.0)

    later = jnp.arange(K)[None, :] > jnp.arange(K)[:, None]
    suppress_row = (iou > iou_threshold) & later  # [K, K]

    def body(i, state):
        keep, suppressed = state
        is_kept = svalid[i] & jnp.logical_not(suppressed[i])
        keep = keep.at[i].set(is_kept)
        suppressed = suppressed | (suppress_row[i] & is_kept)
        return keep, suppressed

    keep_sorted, _ = jax.lax.fori_loop(
        0,
        K,
        body,
        (jnp.zeros(K, dtype=bool), jnp.zeros(K, dtype=bool)),
    )
    return jnp.zeros(K, dtype=bool).at[order].set(keep_sorted)


def nms(
    boxes: Array,
    scores: Array,
    valid: Array,
    *,
    iou_threshold: float = 0.5,
    class_ids: Array | None = None,
) -> tuple[Array, Array, Array]:
    """NMS returning (boxes, scores, keep_mask) with suppressed scores zeroed."""
    keep = nms_keep_mask(
        boxes, scores, valid, iou_threshold=iou_threshold, class_ids=class_ids
    )
    return boxes, jnp.where(keep, scores, 0.0), keep
