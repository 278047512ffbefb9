"""Golden tests for box math against reference hand-fixtures.

The IoU fixture reproduces the reference's __main__ smoke block
(/root/reference/utils/utils.py:506-525) and the conversion semantics of
convert_CxCyWH_to_X1Y1X2Y2 (:59-75).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_v1_tpu.core import boxes


def _np_iou(b1, b2, plus_one=False):
    off = 1.0 if plus_one else 0.0
    out = np.zeros((len(b1), len(b2)))
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            iw = min(a[2], b[2]) - max(a[0], b[0]) + off
            ih = min(a[3], b[3]) - max(a[1], b[1]) + off
            inter = max(iw, 0) * max(ih, 0)
            union = (
                (a[2] - a[0] + off) * (a[3] - a[1] + off)
                + (b[2] - b[0] + off) * (b[3] - b[1] + off)
                - inter
            )
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def test_iou_matrix_reference_fixture():
    # Hand-written boxes from the reference smoke test (utils/utils.py:506-516).
    b1 = jnp.array([[10, 20, 100, 123], [200, 300, 300, 350]], jnp.float32)
    b2 = jnp.array(
        [[50, 60, 150, 120], [0, 10, 123, 150], [170, 190, 310, 400]], jnp.float32
    )
    got = boxes.iou_matrix(b1, b2)
    want = _np_iou(np.asarray(b1), np.asarray(b2))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_iou_matrix_random(rng):
    b1 = rng.uniform(0, 1, (17, 4)).astype(np.float32)
    b2 = rng.uniform(0, 1, (9, 4)).astype(np.float32)
    # Make proper corner boxes.
    b1 = np.concatenate([np.minimum(b1[:, :2], b1[:, 2:]),
                         np.maximum(b1[:, :2], b1[:, 2:]) + 0.01], axis=1)
    b2 = np.concatenate([np.minimum(b2[:, :2], b2[:, 2:]),
                         np.maximum(b2[:, :2], b2[:, 2:]) + 0.01], axis=1)
    for plus_one in (False, True):
        got = boxes.iou_matrix(jnp.asarray(b1), jnp.asarray(b2), plus_one=plus_one)
        want = _np_iou(b1, b2, plus_one=plus_one)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_iou_matrix_batched(rng):
    b = rng.uniform(0, 1, (3, 5, 4)).astype(np.float32)
    b = np.concatenate(
        [np.minimum(b[..., :2], b[..., 2:]), np.maximum(b[..., :2], b[..., 2:]) + 0.01],
        axis=-1,
    )
    got = boxes.iou_matrix(jnp.asarray(b), jnp.asarray(b))
    assert got.shape == (3, 5, 5)
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(got[k]), _np_iou(b[k], b[k]), rtol=1e-5
        )
    # Diagonal is 1 (boxes match themselves).
    np.testing.assert_allclose(np.asarray(got)[:, np.arange(5), np.arange(5)], 1.0,
                               rtol=1e-6)


def test_cell_cxcywh_to_xyxy_matches_reference_formula():
    # Reference formula (utils/utils.py:72-73): corners = xy/S -/+ 0.5*wh.
    S = 7
    t = jnp.array([[0.5, 0.25, 0.2, 0.4], [0.0, 0.0, 0.1, 0.1]], jnp.float32)
    got = np.asarray(boxes.cell_cxcywh_to_xyxy(t, S))
    want = np.stack(
        [
            np.asarray(t)[:, 0] / S - 0.5 * np.asarray(t)[:, 2],
            np.asarray(t)[:, 1] / S - 0.5 * np.asarray(t)[:, 3],
            np.asarray(t)[:, 0] / S + 0.5 * np.asarray(t)[:, 2],
            np.asarray(t)[:, 1] / S + 0.5 * np.asarray(t)[:, 3],
        ],
        axis=1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cxcywh_xyxy_roundtrip(rng):
    b = rng.uniform(0.1, 0.9, (11, 4)).astype(np.float32)
    back = boxes.xyxy_to_cxcywh(boxes.cxcywh_to_xyxy(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-5, atol=1e-6)


def test_unnormalize_truncates_like_reference():
    # Reference bbox_un_norm does int(coord*448) after the driver clamps to
    # [0,1] (utils/utils.py:347-354, 406-407).
    b = jnp.array([[0.5, 0.25, 1.2, -0.1]], jnp.float32)
    got = np.asarray(boxes.unnormalize(b))
    np.testing.assert_array_equal(got, [[224.0, 112.0, 448.0, 0.0]])


def test_elementwise_iou_matches_matrix(rng):
    a = rng.uniform(0, 0.5, (6, 4)).astype(np.float32)
    a = np.concatenate([a[:, :2], a[:, :2] + a[:, 2:] + 0.01], axis=1)
    b = rng.uniform(0, 0.5, (6, 4)).astype(np.float32)
    b = np.concatenate([b[:, :2], b[:, :2] + b[:, 2:] + 0.01], axis=1)
    ew = np.asarray(boxes.elementwise_iou(jnp.asarray(a), jnp.asarray(b)))
    mat = np.asarray(boxes.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ew, np.diag(mat), rtol=1e-6)
