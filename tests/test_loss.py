"""Loss differential tests: vectorized JAX loss vs a straightforward
per-object numpy reimplementation of the reference semantics
(/root/reference/v1Loss.py:22-118, with the documented divergences:
paper-correct coord term, stop-grad IoU target)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from yolo_v1_tpu.core.grid import encode_targets
from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig, yolo_v1_loss


def np_cell_to_xyxy(box, S):
    c = np.asarray(box[:2], np.float64) / S
    h = 0.5 * np.asarray(box[2:], np.float64)
    return np.concatenate([c - h, c + h])


def np_iou(a, b):
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[0] * wh[1]
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / union if union > 0 else 0.0


def ref_loss_np(pred, target, S, B=2, C=20, l_coord=5.0, l_noobj=0.5):
    """Per-object loop implementation of the loss semantics."""
    N = pred.shape[0]
    pred = pred.astype(np.float64)
    target = target.astype(np.float64)
    cls_loss = coord_loss = obj_conf = 0.0
    contain = np.zeros((N, S, S, B), bool)
    iou_t = np.zeros((N, S, S, B))
    for n in range(N):
        for i in range(S):
            for j in range(S):
                if target[n, i, j, 0] != 1.0:
                    continue
                cls_loss += np.sum(
                    (pred[n, i, j, 5 * B :] - target[n, i, j, 5 * B :]) ** 2
                )
                gt_box = target[n, i, j, B : B + 4]
                gt_xy = np_cell_to_xyxy(gt_box, S)
                ious = []
                for b in range(B):
                    pb = pred[n, i, j, B + 4 * b : B + 4 * b + 4]
                    ious.append(np_iou(np_cell_to_xyxy(pb, S), gt_xy))
                bstar = int(np.argmax(ious))
                contain[n, i, j, bstar] = True
                iou_t[n, i, j, bstar] = ious[bstar]
                pb = pred[n, i, j, B + 4 * bstar : B + 4 * bstar + 4]
                coord_loss += np.sum((pb[:2] - gt_box[:2]) ** 2)
                coord_loss += np.sum(
                    (np.sqrt(np.clip(pb[2:], 1e-12, None)) - np.sqrt(gt_box[2:])) ** 2
                )
                obj_conf += (pred[n, i, j, bstar] - ious[bstar]) ** 2
    noobj_conf = np.sum((pred[..., :B] ** 2)[~contain])
    total = (l_coord * coord_loss + obj_conf + l_noobj * noobj_conf + cls_loss) / N
    return total, dict(
        location=coord_loss / N,
        confidence=obj_conf / N,
        no_object=noobj_conf / N,
        classify=cls_loss / N,
    )


def make_pair(rng, N, S, B=2, C=20):
    """Random prediction + a real encoded target (analog of the reference
    fixture make_eval_tensor, utils/utils.py:77-92, but with valid targets)."""
    pred = rng.uniform(0, 1, (N, S, S, B * 5 + C)).astype(np.float32)
    boxes = np.zeros((N, 6, 4), np.float32)
    labels = np.zeros((N, 6), np.int32)
    counts = rng.integers(0, 6, N)
    for n in range(N):
        k = counts[n]
        boxes[n, :k, :2] = rng.uniform(0.1, 0.9, (k, 2))
        boxes[n, :k, 2:] = rng.uniform(0.05, 0.4, (k, 2))
        labels[n, :k] = rng.integers(0, C, k)
    target = np.asarray(
        encode_targets(
            jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(counts), S=S, B=B, C=C
        )
    )
    return pred, target


def test_loss_matches_numpy_reference(rng):
    for S in (7, 14):
        pred, target = make_pair(rng, 3, S)
        cfg = YoloV1LossConfig(S=S)
        total, parts = yolo_v1_loss(jnp.asarray(pred), jnp.asarray(target), cfg)
        want_total, want_parts = ref_loss_np(pred, target, S)
        np.testing.assert_allclose(float(total), want_total, rtol=1e-4)
        for k in ("location", "confidence", "no_object", "classify"):
            np.testing.assert_allclose(
                float(parts[k]), want_parts[k], rtol=1e-4, atol=1e-6
            )


def test_loss_empty_targets(rng):
    """No objects: only the no-object confidence term is non-zero."""
    S, B, C = 7, 2, 20
    pred = rng.uniform(0, 1, (2, S, S, 30)).astype(np.float32)
    target = np.zeros((2, S, S, 30), np.float32)
    total, parts = yolo_v1_loss(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(parts["classify"]), 0.0)
    np.testing.assert_allclose(float(parts["location"]), 0.0)
    np.testing.assert_allclose(float(parts["confidence"]), 0.0)
    want = 0.5 * np.sum(pred[..., :B] ** 2) / 2
    np.testing.assert_allclose(float(total), want, rtol=1e-5)


def test_loss_is_differentiable(rng):
    pred, target = make_pair(rng, 2, 7)
    grad = jax.grad(lambda p: yolo_v1_loss(p, jnp.asarray(target))[0])(
        jnp.asarray(pred)
    )
    g = np.asarray(grad)
    assert np.all(np.isfinite(g))
    assert np.any(g != 0)


def test_loss_zero_when_perfect_prediction(rng):
    """A prediction equal to its target with IoU-1 boxes has ~zero loss in
    the obj terms; noobj term only over empty cells with conf 0."""
    S = 7
    boxes = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    labels = np.array([4], np.int32)
    target = np.asarray(
        encode_targets(
            jnp.asarray(boxes)[None], jnp.asarray(labels)[None], jnp.asarray([1]), S=S
        )
    )
    pred = target.copy()
    # Perfect box => IoU 1 => conf target 1 == stored conf.
    total, parts = yolo_v1_loss(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(parts["location"]), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(parts["classify"]), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(parts["confidence"]), 0.0, atol=1e-10)
    # The twin (non-responsible) slot also carries conf 1 in the target grid,
    # so it contributes to the noobj term — same as the reference
    # (v1Loss.py:91 includes the twin).
    np.testing.assert_allclose(float(parts["no_object"]), 1.0, atol=1e-6)


def test_loss_tie_goes_to_first_box():
    """Identical B boxes: argmax picks slot 0, like torch max."""
    S, B, C = 7, 2, 20
    boxes = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    labels = np.array([0], np.int32)
    target = np.asarray(
        encode_targets(
            jnp.asarray(boxes)[None], jnp.asarray(labels)[None], jnp.asarray([1]), S=S
        )
    )
    pred = target.copy()
    pred[0, ..., 0] = 0.9  # responsible slot conf
    pred[0, ..., 1] = 0.2
    total, parts = yolo_v1_loss(jnp.asarray(pred), jnp.asarray(target))
    # obj cell: row 3 col 3. Slot 0 responsible with IoU 1 -> (0.9-1)^2.
    np.testing.assert_allclose(float(parts["confidence"]), 0.01, rtol=1e-5)


def test_pallas_assignment_matches_xla(rng):
    """The fused Pallas assignment kernel (interpret mode) gives the same
    loss AND gradients as the vectorized XLA path."""
    import dataclasses

    for S in (7, 14):
        pred, target = make_pair(rng, 2, S)
        cfg_x = YoloV1LossConfig(S=S)
        cfg_p = YoloV1LossConfig(
            S=S, assignment_impl="pallas", assignment_interpret=True
        )
        tx, px = yolo_v1_loss(jnp.asarray(pred), jnp.asarray(target), cfg_x)
        tp, pp = yolo_v1_loss(jnp.asarray(pred), jnp.asarray(target), cfg_p)
        np.testing.assert_allclose(float(tx), float(tp), rtol=1e-6)
        for k in px:
            np.testing.assert_allclose(
                float(px[k]), float(pp[k]), rtol=1e-5, atol=1e-7, err_msg=k
            )
        gx = jax.grad(lambda p: yolo_v1_loss(p, jnp.asarray(target), cfg_x)[0])(
            jnp.asarray(pred)
        )
        gp = jax.grad(lambda p: yolo_v1_loss(p, jnp.asarray(target), cfg_p)[0])(
            jnp.asarray(pred)
        )
        np.testing.assert_allclose(
            np.asarray(gx), np.asarray(gp), rtol=1e-5, atol=1e-6
        )


def test_pallas_assignment_requires_stop_gradient(rng):
    pred, target = make_pair(rng, 1, 7)
    cfg = YoloV1LossConfig(
        S=7, assignment_impl="pallas", assignment_interpret=True,
        iou_target_stop_gradient=False,
    )
    with pytest.raises(AssertionError):
        yolo_v1_loss(jnp.asarray(pred), jnp.asarray(target), cfg)


def test_sample_weight_masks_padded_rows_exactly(rng):
    """Loss of a wrap-padded batch with zero-weighted pad rows must equal
    the unpadded loss (up to f32 reduction order — the padded batch sums 16
    per-image values instead of 12; the mesh-padding contract,
    parallel/mesh.pad_to_multiple + train/loop)."""
    pred, target = make_pair(rng, 12, 7)
    idx = np.arange(16) % 12  # pad 12 -> 16 wrap-around
    pred_p, target_p = pred[idx], target[idx]
    w = (np.arange(16) < 12).astype(np.float32)
    t0, p0 = yolo_v1_loss(jnp.asarray(pred), jnp.asarray(target))
    t1, p1 = yolo_v1_loss(
        jnp.asarray(pred_p), jnp.asarray(target_p),
        YoloV1LossConfig(), jnp.asarray(w),
    )
    np.testing.assert_allclose(float(t0), float(t1), rtol=1e-5)
    for k in p0:
        np.testing.assert_allclose(
            float(p0[k]), float(p1[k]), rtol=1e-5, atol=1e-7, err_msg=k
        )


def test_sample_weight_gradients_ignore_padded_rows(rng):
    pred, target = make_pair(rng, 4, 7)
    idx = np.arange(8) % 4
    w = (np.arange(8) < 4).astype(np.float32)
    g = jax.grad(
        lambda p: yolo_v1_loss(
            p, jnp.asarray(target[idx]), YoloV1LossConfig(), jnp.asarray(w)
        )[0]
    )(jnp.asarray(pred[idx]))
    g = np.asarray(g)
    # zero-weight rows contribute nothing and receive no gradient
    np.testing.assert_array_equal(g[4:], 0.0)
    g_ref = np.asarray(
        jax.grad(lambda p: yolo_v1_loss(p, jnp.asarray(target))[0])(
            jnp.asarray(pred)
        )
    )
    np.testing.assert_allclose(g[:4], g_ref, rtol=1e-6, atol=1e-8)
