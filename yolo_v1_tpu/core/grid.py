"""Target-grid encoding and prediction decoding — batched, static-shape, jit.

Capability parity:

* ``encode_targets`` reproduces the reference target encoder
  (`/root/reference/utils/YOLODataLoader.py:200-230`): a [S,S,B*5+C] grid in
  the layout ``[conf x B | (x,y,w,h) x B | C one-hot]`` (conf slots FIRST —
  reference v1Loss.py:24-25), cell index ``ceil(cxcy*S)-1``, x/y stored
  cell-relative, w/h image-normalized, and *all* B slots carrying the same
  ground-truth box.  When several objects land in one cell the reference's
  loop makes the last one win (it zeroes the cell then rewrites it); we
  reproduce that deterministically with an arg-max over box indices.

* ``decode_grid`` reproduces the reference prediction decoder
  (`/root/reference/utils/utils.py:94-147`): candidate mask
  ``conf > 1e-4  OR  conf == global-max-conf``, score = conf * best class
  prob, kept when score > threshold, box centers moved from cell-relative to
  image coordinates.  Instead of the reference's S*S*B Python loop this is a
  single vectorized computation producing a fixed K = S*S*B candidate set
  plus a validity mask (XLA needs static shapes; invalid slots are masked).

The reference clamps nothing here; out-of-image corners are clamped later by
the mAP driver (utils/utils.py:406), mirrored in eval/voc_map.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array


def layout_sizes(B: int, C: int) -> int:
    """Channels of the prediction/target grid: [conf x B | 4 x B | C]."""
    return B * 5 + C


def to_interleaved_layout(grid: Array, B: int = 2) -> Array:
    """Conf-first [conf x B | xywh x B | C] -> interleaved
    [(xywh_b, conf_b) x B | C].

    The reference's third-party-loss convention shuffle
    (`/root/reference/testCodes/tensor_test.py:99-107`); inverse of
    ``from_interleaved_layout`` (eval.py:22-30).  Works on [..., B*5+C].
    """
    parts = []
    for b in range(B):
        parts.append(grid[..., B + 4 * b : B + 4 * b + 4])  # xywh_b
        parts.append(grid[..., b : b + 1])  # conf_b
    parts.append(grid[..., 5 * B :])
    return jnp.concatenate(parts, axis=-1)


def from_interleaved_layout(grid: Array, B: int = 2) -> Array:
    """Interleaved [(xywh_b, conf_b) x B | C] -> conf-first layout.

    Mirrors the reference's ``convert_input_tensor_dim``
    (`/root/reference/eval.py:22-30`), generalized over B.
    """
    confs = [grid[..., 5 * b + 4 : 5 * b + 5] for b in range(B)]
    boxes = [grid[..., 5 * b : 5 * b + 4] for b in range(B)]
    return jnp.concatenate(confs + boxes + [grid[..., 5 * B :]], axis=-1)


def encode_targets(
    boxes: Array,
    labels: Array,
    num_boxes: Array,
    *,
    S: int,
    B: int = 2,
    C: int = 20,
) -> Array:
    """Encode padded ground-truth boxes into YOLOv1 target grids.

    Args:
      boxes: [N, M, 4] (cx, cy, w, h), image-normalized; padded with zeros.
      labels: [N, M] int class ids in [0, C); padding values ignored.
      num_boxes: [N] number of valid boxes per image.
      S: grid size (7 or 14).
      B: boxes per cell.
      C: number of classes.

    Returns:
      [N, S, S, B*5+C] target grid (conf-first layout).
    """
    N, M = boxes.shape[0], boxes.shape[1]
    cxcy = boxes[..., :2]
    wh = boxes[..., 2:]

    # Reference cell index: ceil(cxcy / cell) - 1  (YOLODataLoader.py:219).
    # col from cx, row from cy.  The reference lets an exact-zero coordinate
    # wrap to index -1 (torch negative indexing); we clamp to [0, S-1].
    ij = jnp.ceil(cxcy * S) - 1.0
    col = jnp.clip(ij[..., 0], 0, S - 1).astype(jnp.int32)  # [N, M]
    row = jnp.clip(ij[..., 1], 0, S - 1).astype(jnp.int32)
    cell = row * S + col  # [N, M]

    valid = (
        jnp.arange(M)[None, :] < num_boxes[:, None]
    )  # [N, M]
    # Degenerate augmented boxes (w<=0 or h<=0) never produce a target in the
    # reference either (imgaug clips them away); mask them out defensively.
    valid = valid & (wh[..., 0] > 0) & (wh[..., 1] > 0)

    # Last-valid-box-wins per cell, like the reference's overwrite loop
    # (YOLODataLoader.py:217-227): rank each box by its index + 1 and take the
    # arg-max among boxes mapping to the cell.
    match = (cell[:, :, None] == jnp.arange(S * S)[None, None, :]) & valid[:, :, None]
    rank = (jnp.arange(M, dtype=jnp.int32) + 1)[None, :, None] * match  # [N, M, S*S]
    winner = jnp.argmax(rank, axis=1)  # [N, S*S] box index (0 if none)
    has_obj = jnp.any(match, axis=1)  # [N, S*S]

    take = partial(jnp.take_along_axis, axis=1)
    win_cxcy = take(cxcy, winner[..., None])  # [N, S*S, 2]
    win_wh = take(wh, winner[..., None])
    win_label = jnp.take_along_axis(labels, winner, axis=1)  # [N, S*S]
    win_col = take(jnp.broadcast_to(col[..., None], (N, M, 1)), winner[..., None])
    win_row = take(jnp.broadcast_to(row[..., None], (N, M, 1)), winner[..., None])
    win_ij = jnp.concatenate([win_col, win_row], axis=-1).astype(boxes.dtype)

    # delta_xy = (cxcy - ij*cell_size) / cell_size = cxcy * S - ij
    delta_xy = win_cxcy * S - win_ij  # [N, S*S, 2]

    obj = has_obj.astype(boxes.dtype)  # [N, S*S]
    conf = jnp.broadcast_to(obj[..., None], (N, S * S, B))
    one_box = jnp.concatenate([delta_xy, win_wh], axis=-1) * obj[..., None]
    boxes_rep = jnp.tile(one_box, (1, 1, B))  # [N, S*S, 4B] same box in all slots
    cls = jax.nn.one_hot(win_label, C, dtype=boxes.dtype) * obj[..., None]

    grid = jnp.concatenate([conf, boxes_rep, cls], axis=-1)
    return grid.reshape(N, S, S, B * 5 + C)


def decode_grid(
    pred: Array,
    *,
    S: int,
    B: int = 2,
    C: int = 20,
    conf_floor: float = 1e-4,
    score_threshold: float = 0.3,
) -> tuple[Array, Array, Array, Array]:
    """Decode one [S,S,B*5+C] prediction grid into K = S*S*B candidates.

    Vectorized equivalent of the reference decoder's triple loop
    (utils/utils.py:115-132).  Returns fixed-shape arrays plus validity:

      boxes:   [K, 4] image-normalized corners (unclamped, like reference)
      scores:  [K] conf * best-class-prob
      classes: [K] int32 best class index
      valid:   [K] bool — candidate passed both the conf mask and the score
               threshold (reference mask :111-114 and thresh test :129)

    Batched use: ``jax.vmap(partial(decode_grid, S=S))(preds)``.
    """
    pred = pred.reshape(S, S, B * 5 + C)
    conf = pred[..., :B]  # [S, S, B]
    mask = (conf > conf_floor) | (conf == jnp.max(conf))

    raw = pred[..., B : 5 * B].reshape(S, S, B, 4)
    cell = 1.0 / S
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S, B), 1).astype(pred.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S, B), 0).astype(pred.dtype)
    cx = raw[..., 0] * cell + col * cell
    cy = raw[..., 1] * cell + row * cell
    half_w = 0.5 * raw[..., 2]
    half_h = 0.5 * raw[..., 3]
    boxes = jnp.stack([cx - half_w, cy - half_h, cx + half_w, cy + half_h], axis=-1)

    cls_probs = pred[..., 5 * B :]  # [S, S, C]
    best_prob = jnp.max(cls_probs, axis=-1)  # [S, S]
    best_cls = jnp.argmax(cls_probs, axis=-1).astype(jnp.int32)

    scores = conf * best_prob[..., None]  # [S, S, B]
    valid = mask & (scores > score_threshold)

    K = S * S * B
    return (
        boxes.reshape(K, 4),
        scores.reshape(K),
        jnp.broadcast_to(best_cls[..., None], (S, S, B)).reshape(K),
        valid.reshape(K),
    )
