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


def test_detections_from_arrays_masks_and_sorts():
    """The shared ragged-extraction helper (Predictor + ArtifactPredictor/
    serve --artifact): keep mask filters slots, output sorted by score."""
    from yolo_v1_tpu.eval.predictor import detections_from_arrays

    boxes = np.zeros((2, 4, 4), np.float32)
    boxes[0, 0] = [0.1, 0.1, 0.2, 0.2]
    boxes[0, 2] = [0.3, 0.3, 0.4, 0.4]
    scores = np.array([[0.2, 0.9, 0.7, 0.1], [0.5, 0.6, 0.7, 0.8]], np.float32)
    classes = np.array([[3, 1, 5, 0], [2, 2, 2, 2]], np.int32)
    keep = np.array(
        [[True, False, True, False], [False, False, False, False]]
    )
    out = detections_from_arrays(boxes, scores, classes, keep, ["c%d" % i for i in range(6)])
    assert len(out) == 2 and out[1] == []
    assert [d["score"] for d in out[0]] == sorted(
        [d["score"] for d in out[0]], reverse=True
    )
    assert out[0][0]["class_name"] == "c5" and out[0][0]["box"] == [
        0.30000001192092896, 0.30000001192092896,
        0.4000000059604645, 0.4000000059604645,
    ]


def test_artifact_predictor_rejects_wrong_shape(tmp_path):
    """Exported programs have ONE shape; a mismatched batch must fail
    loudly before reaching the compiled call (eval/export.py)."""
    import pytest

    from yolo_v1_tpu.cli import main as cli_main
    from yolo_v1_tpu.eval.export import ArtifactPredictor

    rc = cli_main(
        ["export", "--backbone", "tiny", "--S", "7", "--image_size", "112",
         "--eval_batch_size", "2", "--bf16", "false",
         "--save_dir", str(tmp_path / "art")]
    )
    assert rc == 0
    pred = ArtifactPredictor(str(tmp_path / "art"))
    with pytest.raises(ValueError, match="ONE shape"):
        pred(np.zeros((3, 112, 112, 3), np.uint8))


def test_predictor_mesh_matches_single_device(rng):
    """Data-parallel serving (Predictor mesh=...): batch sharded over the
    data axis must produce the same detections as single-device serving
    (the serving analog of the train-path 1-vs-8-device equivalence)."""
    from yolo_v1_tpu.parallel.mesh import make_mesh

    model = build_model("tiny", S=7)
    images = rng.integers(0, 255, (8, 112, 112, 3), np.uint8)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 112, 112, 3), np.float32), train=False
    )
    single = Predictor(model, variables, S=7, score_threshold=0.05)
    meshed = Predictor(
        model, variables, S=7, score_threshold=0.05, mesh=make_mesh(4)
    )
    a, b = single(images), meshed(images)
    assert len(a) == len(b)
    for da, db in zip(a, b):
        assert len(da) == len(db)
        for xa, xb in zip(da, db):
            assert xa["class_id"] == xb["class_id"]
            np.testing.assert_allclose(xa["box"], xb["box"], atol=1e-3)
            np.testing.assert_allclose(xa["score"], xb["score"], atol=1e-3)
