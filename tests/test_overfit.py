"""Tiny-overfit integration test: the whole stack — pipeline, encoder,
model, loss, optimizer, evaluator — must be able to fit a handful of
synthetic images (the analog of the reference's train-split mAP fit check,
testCodes/resnet_result.txt '---map 0.8871...')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_v1_tpu.core.grid import encode_targets
from yolo_v1_tpu.data.pipeline import PipelineConfig, YoloDataset, collate
from yolo_v1_tpu.data.voc import prep_test_data
from yolo_v1_tpu.eval.voc_map import VocEvaluator
from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
from yolo_v1_tpu.models.registry import build_model
from yolo_v1_tpu.train.loop import jit_train_step
from yolo_v1_tpu.train.state import create_train_state, make_optimizer


@pytest.mark.slow
def test_tiny_overfit_reaches_high_map(voc_tree):
    list_file, _ = voc_tree
    cfg = PipelineConfig(image_size=112, S=7, num_workers=2)
    ds = YoloDataset(list_file, train=False, config=cfg)  # no aug: pure fit

    samples = [ds.load_sample(i) for i in range(len(ds))]
    images, boxes, labels, counts = collate(samples)
    targets = np.asarray(
        encode_targets(boxes, labels, counts, S=7)
    )

    model = build_model("tiny", S=7)
    tx = make_optimizer(lambda s: 5e-3, "sgd", momentum=0.9)
    state = create_train_state(model, jax.random.PRNGKey(0), (8, 112, 112, 3), tx)
    step = jit_train_step(YoloV1LossConfig(S=7))

    im = jnp.asarray(images)
    tg = jnp.asarray(targets)
    first = last = None
    for i in range(300):
        state, parts = step(state, im, tg)
        if i == 0:
            first = float(parts["total"])
    last = float(parts["total"])
    assert last < first * 0.1, (first, last)

    evaluator = VocEvaluator(
        ds, gt_full=prep_test_data(list_file), batch_size=8,
    )
    mAP = evaluator.full_map(state)
    # Synthetic solid rectangles, training set == eval set: the stack must
    # reach a solid fit — measured plateau is 0.45 over all 20 classes
    # (≈0.8+ per present class). (Untrained nets score ~0 — see test_eval.)
    assert mAP > 0.35, mAP