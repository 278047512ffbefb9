"""Pallas NMS kernel parity vs the XLA implementation (interpreter mode on
CPU; the same kernel is verified compiled on real TPU hardware — see
ops/pallas/nms_kernel.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_v1_tpu.core.nms import nms_keep_mask
from yolo_v1_tpu.ops.pallas.nms_kernel import pallas_nms_keep_mask


def make_batch(rng, N, K):
    cxy = rng.uniform(0.1, 0.9, (N, K, 2))
    wh = rng.uniform(0.05, 0.4, (N, K, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (N, K)).astype(np.float32)
    valid = rng.uniform(0, 1, (N, K)) > 0.3
    return boxes, scores, valid


@pytest.mark.parametrize("K", [98, 392])
def test_pallas_nms_matches_xla(rng, K):
    N = 2
    boxes, scores, valid = make_batch(rng, N, K)
    got = np.asarray(
        pallas_nms_keep_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            iou_threshold=0.45, interpret=True,
        )
    )
    want = np.stack(
        [
            np.asarray(
                nms_keep_mask(
                    jnp.asarray(boxes[i]), jnp.asarray(scores[i]),
                    jnp.asarray(valid[i]), iou_threshold=0.45,
                )
            )
            for i in range(N)
        ]
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_nms_all_invalid(rng):
    boxes, scores, _ = make_batch(rng, 1, 98)
    keep = np.asarray(
        pallas_nms_keep_mask(
            jnp.asarray(boxes), jnp.asarray(scores),
            jnp.zeros((1, 98), bool), interpret=True,
        )
    )
    assert not keep.any()
