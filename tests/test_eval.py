"""End-to-end evaluator tests: a 'perfect oracle' whose predictions equal the
GT grids must score mAP ~1.0; an untrained net must score ~0."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from yolo_v1_tpu.core.grid import encode_targets
from yolo_v1_tpu.data.pipeline import PipelineConfig, YoloDataset
from yolo_v1_tpu.data.voc import VOC_CLASSES, image_id_of, prep_test_data
from yolo_v1_tpu.eval.voc_map import VocEvaluator, detections_to_preds, make_detector
from yolo_v1_tpu.models.registry import build_model
from yolo_v1_tpu.train.state import TrainState, create_train_state, make_optimizer


class OracleNet(nn.Module):
    """Emits the exact GT grid for each fixture image (keyed by a stored
    lookup table baked into constants) — exercises decode+NMS+AP exactly."""

    grids: np.ndarray  # [n_images, S, S, 30]
    keys: np.ndarray  # [n_images] image index embedded in pixel (0,0,0)

    @nn.compact
    def __call__(self, x, train=False):
        # Match on the marker pixel value stamped into each image.
        marker = x[:, 0, 0, 0]  # [N]
        table = jnp.asarray(self.grids)
        keys = jnp.asarray(self.keys)
        dist = jnp.abs(marker[:, None] - keys[None, :])
        idx = jnp.argmin(dist, axis=1)
        return table[idx]


def make_oracle_state(grids, keys):
    model = OracleNet(grids=grids, keys=keys)
    dummy = jnp.zeros((1, 112, 112, 3))
    variables = {"params": {}, "batch_stats": {}}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        apply_fn=lambda v, x, train=False: model.apply({}, x, train=train),
        params={},
        batch_stats={},
        tx=None,
        opt_state=None,
    )


@pytest.fixture
def eval_setup(voc_tree):
    list_file, gt = voc_tree
    cfg = PipelineConfig(image_size=112, S=7, num_workers=2)
    ds = YoloDataset(list_file, train=False, config=cfg)
    target = prep_test_data(list_file)
    return ds, target, gt


def test_oracle_scores_full_map(eval_setup, monkeypatch):
    ds, target, gt = eval_setup
    n = len(ds)
    # Build the GT grid per image and a marker-keyed oracle.
    grids, keys = [], []
    for i in range(n):
        img, boxes, labels = ds.load_sample(i)
        t = encode_targets(
            jnp.asarray(boxes)[None],
            jnp.asarray(labels)[None],
            jnp.asarray([len(boxes)]),
            S=7,
        )[0]
        grids.append(np.asarray(t))
        keys.append(img[0, 0, 0])
    state = make_oracle_state(np.stack(grids), np.asarray(keys))

    evaluator = VocEvaluator(
        ds, gt_full=target, batch_size=4,
        # GT boxes as predictions: IoU vs GT is 1, far above 0.5
    )
    mAP = evaluator.full_map(state)
    # Oracle predictions == GT, so every present class gets AP 1; absent
    # classes (no predictions AND no GT) score 0 under the fixed policy,
    # diluting the mean. Compare against the densely-present classes only.
    present = {k[1] for k in target}
    expected = len(present) / len(VOC_CLASSES)
    assert mAP == pytest.approx(expected, abs=0.02), (mAP, expected)


def test_untrained_net_scores_low(eval_setup):
    ds, target, gt = eval_setup
    model = build_model("tiny", S=7)
    tx = make_optimizer(lambda s: 1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 112, 112, 3), tx)
    evaluator = VocEvaluator(ds, gt_full=target, batch_size=4)
    mAP = evaluator.full_map(state)
    assert 0.0 <= mAP < 0.3


def test_detections_to_preds_scaling():
    boxes = np.array([[[0.25, 0.25, 0.5, 0.5]]], np.float32)
    scores = np.array([[0.9]], np.float32)
    classes = np.array([[7]], np.int32)
    keep = np.array([[True]])
    preds = detections_to_preds(boxes, scores, classes, keep, ["imgX"])
    assert preds[VOC_CLASSES[7]] == [["imgX", pytest.approx(0.9), 112, 112, 224, 224]]


def test_evaluator_on_mesh_matches_single_device(eval_setup):
    from yolo_v1_tpu.parallel.mesh import make_mesh

    ds, target, gt = eval_setup
    model = build_model("tiny", S=7)
    tx = None
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        apply_fn=model.apply,
        params=model.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 112, 112, 3)), train=False
        )["params"],
        batch_stats=model.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 112, 112, 3)), train=False
        )["batch_stats"],
        tx=None,
        opt_state=None,
    )
    e1 = VocEvaluator(ds, gt_full=target, batch_size=8, score_threshold=0.02)
    e8 = VocEvaluator(
        ds, gt_full=target, batch_size=8, score_threshold=0.02,
        mesh=make_mesh(8),
    )
    m1 = e1.full_map(state)
    m8 = e8.full_map(state)
    assert m1 == pytest.approx(m8, abs=1e-6)


def test_evaluator_07_metric_option(eval_setup):
    ds, target, gt = eval_setup
    model = build_model("tiny", S=7)
    v = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 112, 112, 3)), train=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), apply_fn=model.apply,
        params=v["params"], batch_stats=v["batch_stats"], tx=None, opt_state=None,
    )
    e = VocEvaluator(ds, gt_full=target, batch_size=8, use_07_metric=True)
    m = e.full_map(state)
    assert 0.0 <= m <= 1.0


def test_device_cache_bounded_and_equivalent(eval_setup):
    """The eval device-cache must stop admitting entries at its HBM bound
    (round-4 rehearsal: an unbounded full-eval cache RESOURCE_EXHAUSTed
    the chip next to a 10 GB resident dataset) — and a bounded cache must
    produce the SAME mAP as uncached streaming."""
    ds, target, gt = eval_setup
    model = build_model("tiny", S=7)
    tx = make_optimizer(lambda s: 1e-2)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 112, 112, 3), tx)

    def build(cache):
        ev = VocEvaluator(
            ds, gt_full=target, batch_size=2, score_threshold=0.01,
            device_cache=cache,
        )
        if cache:
            # Force the byte-budget fallback path with room for ONE entry
            # (CPU memory_stats may or may not report a limit).
            ev._cache_budget_fallback = 2 * 112 * 112 * 3 + 1
            ev._cache_reserve = 1 << 62  # memory_stats path always refuses
        return ev

    ev_stream = build(False)
    ev_cached = build(True)
    map_stream = ev_stream.full_map(state)
    map_cached1 = ev_cached.full_map(state)
    map_cached2 = ev_cached.full_map(state)  # second pass: cache hit + stream mix
    assert map_cached1 == pytest.approx(map_stream, abs=1e-9)
    assert map_cached2 == pytest.approx(map_stream, abs=1e-9)
    # Bounded: exactly one entry fit the fallback budget.
    assert len(ev_cached._device_cache) == 1
    assert ev_cached._cache_full_logged or ev_cached._cache_bytes > 0
    ev_stream.close()
    ev_cached.close()
