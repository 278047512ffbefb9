"""Encoder/decoder tests: differential vs numpy ports of the reference
semantics (YOLODataLoader.py:200-230 encoder, utils/utils.py:94-147 decoder)
plus an encode->decode round-trip property test (the reference's visual
round-trip at YOLODataLoader.py:233-257, made exact)."""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yolo_v1_tpu.core.grid import decode_grid, encode_targets


def ref_encoder_np(boxes, labels, S, B=2, C=20):
    """Direct numpy port of the reference encoder loop
    (YOLODataLoader.py:200-230), with cell indices clamped to the grid."""
    target = np.zeros((S, S, B * 5 + C), np.float32)
    cell = 1.0 / S
    for i in range(len(boxes)):
        cx, cy, w, h = boxes[i]
        if w <= 0 or h <= 0:
            continue
        ij = np.ceil(np.array([cx, cy]) / cell) - 1
        col = int(np.clip(ij[0], 0, S - 1))
        row = int(np.clip(ij[1], 0, S - 1))
        target[row, col, :] = 0
        target[row, col, :B] = 1
        target[row, col, B * 5 + int(labels[i])] = 1
        delta = (np.array([cx, cy]) - ij * cell) / cell
        for b in range(B):
            target[row, col, B + b * 4 : B + b * 4 + 2] = delta
            target[row, col, B + b * 4 + 2 : B + b * 4 + 4] = [w, h]
    return target


def ref_decoder_np(pred, S, B=2, C=20, thresh=0.3):
    """Numpy port of the reference decode triple loop
    (utils/utils.py:108-132), before NMS. Returns list of
    (box_xyxy, cls, score, flat_candidate_index)."""
    pred = pred.reshape(S, S, B * 5 + C)
    cell = 1.0 / S
    contain = pred[:, :, :B]
    mask = (contain > 1e-4) | (contain == contain.max())
    out = []
    for i in range(S):
        for j in range(S):
            for b in range(B):
                if not mask[i, j, b]:
                    continue
                box = pred[i, j, B + b * 4 : B + b * 4 + 4].copy()
                conf = pred[i, j, b]
                box[:2] = box[:2] * cell + np.array([j, i]) * cell
                xy = np.concatenate([box[:2] - 0.5 * box[2:], box[:2] + 0.5 * box[2:]])
                cls = int(np.argmax(pred[i, j, 5 * B :]))
                score = conf * pred[i, j, 5 * B :].max()
                if score > thresh:
                    out.append((xy, cls, score, (i * S + j) * B + b))
    return out


def random_boxes(rng, n):
    cxcy = rng.uniform(0.05, 0.95, (n, 2))
    wh = rng.uniform(0.05, 0.3, (n, 2))
    return np.concatenate([cxcy, wh], axis=1).astype(np.float32)


def test_encoder_matches_reference_port(rng):
    S, B, C, M = 7, 2, 20, 8
    for trial in range(5):
        n = int(rng.integers(0, M + 1))
        boxes = np.zeros((M, 4), np.float32)
        labels = np.zeros((M,), np.int32)
        boxes[:n] = random_boxes(rng, n)
        labels[:n] = rng.integers(0, C, n)
        got = encode_targets(
            jnp.asarray(boxes)[None],
            jnp.asarray(labels)[None],
            jnp.asarray([n]),
            S=S,
            B=B,
            C=C,
        )[0]
        want = ref_encoder_np(boxes[:n], labels[:n], S, B, C)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_encoder_last_box_wins_in_shared_cell():
    # Two boxes in the same cell: the reference overwrite loop keeps the
    # later one (YOLODataLoader.py:217-227).
    S = 7
    boxes = np.array(
        [[0.51, 0.51, 0.2, 0.2], [0.52, 0.52, 0.1, 0.1]], np.float32
    )
    labels = np.array([3, 7], np.int32)
    got = np.asarray(
        encode_targets(
            jnp.asarray(boxes)[None], jnp.asarray(labels)[None], jnp.asarray([2]), S=S
        )[0]
    )
    want = ref_encoder_np(boxes, labels, S)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # Class 7 (the later box) won.
    row, col = 3, 3
    assert got[row, col, 10 + 7] == 1.0
    assert got[row, col, 10 + 3] == 0.0


def test_encoder_s14(rng):
    S, M = 14, 5
    boxes = random_boxes(rng, M)
    labels = rng.integers(0, 20, M).astype(np.int32)
    got = encode_targets(
        jnp.asarray(boxes)[None], jnp.asarray(labels)[None], jnp.asarray([M]), S=S
    )[0]
    want = ref_encoder_np(boxes, labels, S)
    # delta_xy = cxcy*S - ij in f32 vs the reference's (cxcy - ij*cell)/cell
    # in f64 — algebraically identical, so only f32 rounding differs.
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_decoder_matches_reference_port(rng):
    S, B, C = 7, 2, 20
    pred = rng.uniform(0, 1, (S, S, B * 5 + C)).astype(np.float32)
    # Sparsify confidences like real sigmoid outputs after training.
    pred[:, :, :B] *= rng.uniform(0, 1, (S, S, B)) > 0.6
    boxes, scores, classes, valid = decode_grid(
        jnp.asarray(pred), S=S, B=B, C=C, score_threshold=0.1
    )
    want = ref_decoder_np(pred, S, B, C, thresh=0.1)
    got_idx = np.flatnonzero(np.asarray(valid))
    want_idx = np.array(sorted(w[3] for w in want))
    np.testing.assert_array_equal(got_idx, want_idx)
    want_by_idx = {w[3]: w for w in want}
    for k in got_idx:
        wxy, wcls, wscore, _ = want_by_idx[k]
        np.testing.assert_allclose(np.asarray(boxes)[k], wxy, rtol=1e-5, atol=1e-6)
        assert int(np.asarray(classes)[k]) == wcls
        np.testing.assert_allclose(np.asarray(scores)[k], wscore, rtol=1e-5)


def test_encode_decode_roundtrip(rng):
    """GT targets decode back to the cell-quantized original boxes
    (exact version of the reference's visual check,
    YOLODataLoader.py:233-257)."""
    S, B, C, n = 7, 2, 20, 4
    boxes = random_boxes(rng, n)
    # Keep boxes in distinct cells for exact recovery.
    boxes[:, 0] = (np.arange(n) + 0.37) / S
    boxes[:, 1] = (np.arange(n) + 0.61) / S
    labels = rng.integers(0, C, n).astype(np.int32)
    target = encode_targets(
        jnp.asarray(boxes)[None], jnp.asarray(labels)[None], jnp.asarray([n]), S=S
    )[0]
    dboxes, dscores, dclasses, dvalid = decode_grid(
        target, S=S, B=B, C=C, score_threshold=0.5
    )
    got = np.asarray(dboxes)[np.asarray(dvalid)]
    got_cls = np.asarray(dclasses)[np.asarray(dvalid)]
    # Each GT box appears twice (both B slots are identical in the encoder).
    assert got.shape[0] == 2 * n
    want_xyxy = np.concatenate(
        [boxes[:, :2] - 0.5 * boxes[:, 2:], boxes[:, :2] + 0.5 * boxes[:, 2:]], axis=1
    )
    got_unique = got[::2]
    order = np.argsort(got_unique[:, 0])
    want_order = np.argsort(want_xyxy[:, 0])
    np.testing.assert_allclose(
        got_unique[order], want_xyxy[want_order], atol=1e-5
    )
    np.testing.assert_array_equal(got_cls[::2][order], labels[want_order])


def test_decoder_batched_vmap(rng):
    S = 14
    preds = rng.uniform(0, 1, (3, S, S, 30)).astype(np.float32)
    fn = jax.vmap(partial(decode_grid, S=S, score_threshold=0.05))
    boxes, scores, classes, valid = fn(jnp.asarray(preds))
    assert boxes.shape == (3, S * S * 2, 4)
    assert valid.dtype == jnp.bool_


def test_layout_shuffles_are_inverses(rng):
    from yolo_v1_tpu.core.grid import from_interleaved_layout, to_interleaved_layout

    g = jnp.asarray(rng.uniform(0, 1, (2, 7, 7, 30)).astype(np.float32))
    inter = to_interleaved_layout(g)
    back = from_interleaved_layout(inter)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(g))
    # Reference index mapping (eval.py:24-29): conf0 <- ch4, conf1 <- ch9,
    # xywh0 <- 0:4, xywh1 <- 5:9 of the interleaved tensor.
    np.testing.assert_array_equal(np.asarray(inter[..., 4]), np.asarray(g[..., 0]))
    np.testing.assert_array_equal(np.asarray(inter[..., 9]), np.asarray(g[..., 1]))
    np.testing.assert_array_equal(np.asarray(inter[..., 0:4]), np.asarray(g[..., 2:6]))
    np.testing.assert_array_equal(np.asarray(inter[..., 5:9]), np.asarray(g[..., 6:10]))
    np.testing.assert_array_equal(np.asarray(inter[..., 10:]), np.asarray(g[..., 10:]))


def test_make_eval_tensor_fixture():
    from yolo_v1_tpu.core.testing import make_eval_tensor

    pred, target = make_eval_tensor(jax.random.PRNGKey(0), 2, 7)
    assert pred.shape == target.shape == (2, 7, 7, 30)
    t = np.asarray(target)
    assert set(np.unique(t[..., :2])) <= {0.0, 1.0}
    # The loss consumes it without issue.
    from yolo_v1_tpu.losses.yolov1 import yolo_v1_loss

    total, parts = yolo_v1_loss(pred, target)
    assert np.isfinite(float(total))


def test_encoder_cell_boundary_semantics():
    """Exact-boundary centers follow ceil-1 (YOLODataLoader.py:219); an
    exactly-zero coordinate clamps to cell 0 (the reference would wrap to
    the LAST cell via torch negative indexing — documented divergence)."""
    S = 7
    cases = [
        # cx = 1/S exactly -> ceil(1)-1 = 0 (first cell's right edge)
        ([1.0 / S, 0.5, 0.2, 0.2], (3, 0)),
        # cx just past 1/S -> cell 1
        ([1.0 / S + 1e-4, 0.5, 0.2, 0.2], (3, 1)),
        # zero center -> clamped to cell 0 (not wrapped)
        ([0.0, 0.5, 0.2, 0.2], (3, 0)),
        # center exactly 1.0 -> ceil(7)-1 = 6 (last cell)
        ([1.0, 0.5, 0.2, 0.2], (3, 6)),
    ]
    for box, (row, col) in cases:
        t = np.asarray(
            encode_targets(
                jnp.asarray([[box]], jnp.float32),
                jnp.asarray([[5]], jnp.int32),
                jnp.asarray([1]),
                S=S,
            )[0]
        )
        objs = np.argwhere(t[..., 0] == 1.0)
        assert objs.tolist() == [[row, col]], (box, objs)
