"""Differential tests against the ACTUAL reference implementation, executed
live from /root/reference with CPU torch (no code copied — the reference
modules are imported at test time and skipped when not mounted).

Covers the loss terms that are semantically identical by design: class MSE,
object-confidence MSE (IoU target + responsible-box argmax), and no-object
MSE.  The coordinate term deliberately diverges (paper-correct vs the
reference's `[:2]`-row slicing bug, v1Loss.py:101) and is excluded via
lambda_coord=0."""

import sys
import warnings

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

torch = pytest.importorskip("torch")
pytest.importorskip("cv2")

import os  # noqa: E402

if not os.path.isdir(REFERENCE_ROOT):
    pytest.skip("reference repo not mounted", allow_module_level=True)

sys.path.insert(0, REFERENCE_ROOT)
warnings.filterwarnings("ignore")

import jax.numpy as jnp  # noqa: E402

from yolo_v1_tpu.core.grid import encode_targets  # noqa: E402
from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig, yolo_v1_loss  # noqa: E402


def reference_loss(pred, target, l_coord, l_noobj, S=7, B=2, C=20):
    from v1Loss import YOLOLossV1

    layer = YOLOLossV1(
        pred.shape[0], S, B, C, l_coord, l_noobj, _device="cpu"
    )
    out = layer.forward(torch.from_numpy(pred), torch.from_numpy(target))
    return float(out)


def make_pair(rng, N, S=7):
    pred = rng.uniform(0, 1, (N, S, S, 30)).astype(np.float32)
    boxes = np.zeros((N, 4, 4), np.float32)
    labels = np.zeros((N, 4), np.int32)
    counts = rng.integers(1, 5, N)
    for n in range(N):
        k = counts[n]
        boxes[n, :k, :2] = rng.uniform(0.15, 0.85, (k, 2))
        boxes[n, :k, 2:] = rng.uniform(0.1, 0.4, (k, 2))
        labels[n, :k] = rng.integers(0, 20, k)
    target = np.asarray(
        encode_targets(boxes, labels, counts.astype(np.int32), S=S)
    )
    return pred, target


@pytest.mark.parametrize("trial", range(3))
def test_conf_cls_noobj_terms_match_reference(rng, trial):
    pred, target = make_pair(rng, 2)
    # lambda_coord=0 excludes the (deliberately divergent) coordinate term.
    ref_no_noobj = reference_loss(pred, target, l_coord=0.0, l_noobj=0.0)
    ref_with_noobj = reference_loss(pred, target, l_coord=0.0, l_noobj=1.0)

    _, parts = yolo_v1_loss(
        jnp.asarray(pred), jnp.asarray(target), YoloV1LossConfig(S=7)
    )
    ours_conf_cls = float(parts["confidence"]) + float(parts["classify"])
    ours_noobj = float(parts["no_object"])

    np.testing.assert_allclose(ours_conf_cls, ref_no_noobj, rtol=1e-4)
    np.testing.assert_allclose(
        ours_noobj, ref_with_noobj - ref_no_noobj, rtol=1e-4
    )


def test_noobj_only_when_no_objects(rng):
    S = 7
    pred = rng.uniform(0, 1, (2, S, S, 30)).astype(np.float32)
    target = np.zeros((2, S, S, 30), np.float32)
    ref = reference_loss(pred, target, l_coord=5.0, l_noobj=0.5)
    total, _ = yolo_v1_loss(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(total), ref, rtol=1e-5)


# NOTE: an end-to-end comparison against the reference *decoder* module was
# attempted but the reference's own NMS crashes under modern torch (the
# `order[ids+1]` squeeze yields a 0-dim tensor when one candidate remains,
# utils/utils.py:180-183 — torch 0.4 kept it 1-dim).  Decode and NMS are
# instead differential-tested against faithful numpy ports in
# tests/test_grid.py and tests/test_nms.py.
