"""Fused decode+NMS kernel: bit-exact keep-set parity with the two-stage
XLA path (decode_grid + nms_keep_mask) at K=98 (S=7) and K=392 (S=14),
via the Pallas interpreter on CPU.  Hardware timing lives in DESIGN.md."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_v1_tpu.core.grid import decode_grid
from yolo_v1_tpu.core.nms import nms_keep_mask
from yolo_v1_tpu.ops.pallas.fused_decode_nms import pallas_fused_decode_nms


def _random_grids(rng, n, S, B=2, C=20, sparsity=0.5):
    """Sigmoid-like random prediction grids with sparse confidences."""
    ch = B * 5 + C
    g = rng.uniform(0, 1, (n, S, S, ch)).astype(np.float32)
    conf_mask = rng.uniform(0, 1, (n, S, S, B)) < sparsity
    g[..., :B] = np.where(conf_mask, g[..., :B], 0.0)
    return g


def _two_stage_keep(pred, S, B, C, score_threshold, nms_threshold):
    boxes, scores, classes, valid = jax.vmap(
        partial(decode_grid, S=S, B=B, C=C, score_threshold=score_threshold)
    )(pred)
    return jax.vmap(partial(nms_keep_mask, iou_threshold=nms_threshold))(
        boxes, scores, valid
    )


@pytest.mark.parametrize("S", [7, 14])
def test_fused_keep_set_matches_two_stage(rng, S):
    pred = jnp.asarray(_random_grids(rng, 12, S))
    want = np.asarray(_two_stage_keep(pred, S, 2, 20, 0.005, 0.45))
    got = np.asarray(
        pallas_fused_decode_nms(
            pred, S=S, score_threshold=0.005, iou_threshold=0.45,
            interpret=True,
        )
    )
    assert got.shape == want.shape == (12, S * S * 2)
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0  # the fixture actually keeps something


@pytest.mark.parametrize("score_threshold", [0.005, 0.1, 0.9])
def test_fused_thresholds(rng, score_threshold):
    S = 7
    pred = jnp.asarray(_random_grids(rng, 8, S, sparsity=0.8))
    want = np.asarray(_two_stage_keep(pred, S, 2, 20, score_threshold, 0.45))
    got = np.asarray(
        pallas_fused_decode_nms(
            pred, S=S, score_threshold=score_threshold, iou_threshold=0.45,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_fused_all_below_threshold(rng):
    """No candidate above threshold except the global-max fallback."""
    S = 7
    pred = jnp.asarray(_random_grids(rng, 4, S) * 1e-6)
    want = np.asarray(_two_stage_keep(pred, S, 2, 20, 0.005, 0.45))
    got = np.asarray(
        pallas_fused_decode_nms(pred, S=S, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_fused_nondividing_batch(rng):
    """Batch 5 pads to the 8-image chunk granule; outputs trim exactly."""
    S = 7
    pred = jnp.asarray(_random_grids(rng, 5, S))
    want = np.asarray(_two_stage_keep(pred, S, 2, 20, 0.005, 0.45))
    got = np.asarray(pallas_fused_decode_nms(pred, S=S, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fused_duplicate_boxes_tie_break(rng):
    """Identical boxes/scores across slots must resolve like the stable
    argsort (lower candidate index wins, the duplicate is suppressed)."""
    S = 7
    pred = np.zeros((2, S, S, 30), np.float32)
    pred[:, 3, 3, 0] = 0.9  # conf slot 0
    pred[:, 3, 3, 1] = 0.9  # conf slot 1, same box below
    pred[:, 3, 3, 2:6] = [0.5, 0.5, 0.3, 0.3]
    pred[:, 3, 3, 6:10] = [0.5, 0.5, 0.3, 0.3]
    pred[:, 3, 3, 10] = 1.0  # class 0 prob
    pred = jnp.asarray(pred)
    want = np.asarray(_two_stage_keep(pred, S, 2, 20, 0.005, 0.45))
    got = np.asarray(pallas_fused_decode_nms(pred, S=S, interpret=True))
    np.testing.assert_array_equal(got, want)
    k = 3 * S * 2 + 3 * 2  # cell (3,3), slot 0
    assert got[0, k] and not got[0, k + 1]
