"""Serving-path Predictor test: uint8 in, sorted detections out, consistent
with the evaluator's detector on the same weights."""

import jax
import numpy as np

from yolo_v1_tpu.eval.predictor import Predictor
from yolo_v1_tpu.models.registry import build_model


def test_predictor_end_to_end(rng):
    model = build_model("tiny", S=7)
    images = rng.integers(0, 255, (3, 112, 112, 3), np.uint8)
    # init with normalized stats like training would see
    x0 = (images.astype(np.float32) / 255.0 - 0.45) / 0.225
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    pred = Predictor(model, variables, S=7, score_threshold=0.05)
    out = pred(images)
    assert len(out) == 3
    for dets in out:
        scores = [d["score"] for d in dets]
        assert scores == sorted(scores, reverse=True)
        for d in dets:
            assert len(d["box"]) == 4
            assert 0.0 <= min(d["box"]) and max(d["box"]) <= 1.0
            assert d["class_name"]


def test_predictor_deterministic(rng):
    model = build_model("tiny", S=7)
    images = rng.integers(0, 255, (2, 112, 112, 3), np.uint8)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 112, 112, 3), np.float32), train=False
    )
    pred = Predictor(model, variables, S=7, score_threshold=0.05)
    a, b = pred(images), pred(images)
    assert a == b
