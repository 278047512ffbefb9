"""Box geometry primitives — pure jnp, shape-static, vmap/jit friendly.

Capability parity with the reference's box math
(`/root/reference/utils/utils.py:10-75`):

* ``iou_matrix`` — pairwise IoU of two corner-format box sets
  (reference ``compute_iou_matrix``, utils/utils.py:10-57).
* ``cell_cxcywh_to_xyxy`` — cell-relative (cx,cy) + image-normalized (w,h)
  to image-normalized corners (reference ``convert_CxCyWH_to_X1Y1X2Y2``,
  utils/utils.py:59-75: corners = center/S ± wh/2; both boxes of a cell get
  the same constant offset so IoU inside a cell is unaffected).
* ``cxcywh_to_xyxy`` / ``xyxy_to_cxcywh`` — plain format conversions used by
  the data pipeline (reference YOLODataLoader.py:108-154 does these with
  Python loops; here they are vectorized).

Unlike the reference, everything here is batched: leading dimensions are
arbitrary and the last dimension is 4.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def iou_matrix(boxes1: Array, boxes2: Array, *, plus_one: bool = False) -> Array:
    """Pairwise IoU between two sets of corner-format boxes.

    Args:
      boxes1: [..., N, 4] boxes as (x1, y1, x2, y2).
      boxes2: [..., M, 4] boxes as (x1, y1, x2, y2).
      plus_one: if True use the VOC "+1 pixel" area convention
        (reference voc_eval, utils/utils.py:285-289); if False use the
        geometric convention (reference compute_iou_matrix / nms,
        utils/utils.py:45-55, :159).

    Returns:
      [..., N, M] IoU matrix. Degenerate (zero-union) pairs give 0.
    """
    off = 1.0 if plus_one else 0.0
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.maximum(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area1 = (boxes1[..., 2] - boxes1[..., 0] + off) * (
        boxes1[..., 3] - boxes1[..., 1] + off
    )
    area2 = (boxes2[..., 2] - boxes2[..., 0] + off) * (
        boxes2[..., 3] - boxes2[..., 1] + off
    )
    union = area1[..., :, None] + area2[..., None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def elementwise_iou(boxes1: Array, boxes2: Array, *, plus_one: bool = False) -> Array:
    """Elementwise IoU of boxes with identical leading shape: [..., 4] x2 -> [...]."""
    off = 1.0 if plus_one else 0.0
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area1 = (boxes1[..., 2] - boxes1[..., 0] + off) * (
        boxes1[..., 3] - boxes1[..., 1] + off
    )
    area2 = (boxes2[..., 2] - boxes2[..., 0] + off) * (
        boxes2[..., 3] - boxes2[..., 1] + off
    )
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def cell_cxcywh_to_xyxy(boxes: Array, grid_size: int) -> Array:
    """Cell-relative centers + image-normalized sizes -> corner boxes.

    Mirrors reference ``convert_CxCyWH_to_X1Y1X2Y2`` (utils/utils.py:59-75):
    ``corners = cxcy / S -/+ 0.5 * wh``.  The cell offset is deliberately NOT
    added — all boxes compared this way live in the same cell, so a shared
    constant offset cancels in IoU (used by the loss's responsible-box
    assignment, reference v1Loss.py:69-72).

    Args:
      boxes: [..., 4] (cx, cy, w, h) with cx,cy in [0,1) cell-relative and
        w,h image-normalized.
      grid_size: S.
    """
    center = boxes[..., :2] / grid_size
    half = 0.5 * boxes[..., 2:]
    return jnp.concatenate([center - half, center + half], axis=-1)


def cxcywh_to_xyxy(boxes: Array) -> Array:
    """(cx, cy, w, h) -> (x1, y1, x2, y2), same coordinate frame."""
    center = boxes[..., :2]
    half = 0.5 * boxes[..., 2:]
    return jnp.concatenate([center - half, center + half], axis=-1)


def xyxy_to_cxcywh(boxes: Array) -> Array:
    """(x1, y1, x2, y2) -> (cx, cy, w, h), same coordinate frame."""
    center = 0.5 * (boxes[..., :2] + boxes[..., 2:])
    wh = boxes[..., 2:] - boxes[..., :2]
    return jnp.concatenate([center, wh], axis=-1)


def unnormalize(boxes: Array, image_size: tuple[int, int] = (448, 448)) -> Array:
    """Scale normalized corner boxes to pixel coordinates and truncate to int.

    Mirrors reference ``bbox_un_norm`` (utils/utils.py:347-354) which does
    ``int(coord * size)`` — i.e. truncation toward zero, applied after
    clamping to [0, 1].
    """
    w, h = image_size
    scale = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return jnp.trunc(jnp.clip(boxes, 0.0, 1.0) * scale)
