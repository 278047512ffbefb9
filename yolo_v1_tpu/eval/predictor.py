"""Batched serving path: uint8 images in, detections out, one jit.

The reference's inference unit is: cv2 resize -> ToTensor -> Normalize on
host, forward, then Python decode+NMS per image (SURVEY.md §3.5).  The
TPU-native serving path moves everything after JPEG decode onto the chip:

  uint8 RGB [N, H, W, 3]  --H2D (4x fewer bytes than f32)-->
  normalize (ImageNet stats) -> backbone -> decode -> NMS   [single jit]

Host work is only the final ragged extraction of kept boxes.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_v1_tpu.core.grid import decode_grid
from yolo_v1_tpu.core.nms import nms_keep_mask
from yolo_v1_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
from yolo_v1_tpu.data.voc import VOC_CLASSES


def detections_from_arrays(
    boxes: np.ndarray,
    scores: np.ndarray,
    classes: np.ndarray,
    keep: np.ndarray,
    class_names: Sequence[str],
) -> list[list[dict]]:
    """Ragged host-side extraction of kept boxes -> per-image sorted
    detection dicts (shared by Predictor and the artifact server path)."""
    out = []
    for i in range(boxes.shape[0]):
        dets = []
        for k in np.flatnonzero(keep[i]):
            cid = int(classes[i, k])
            dets.append(
                {
                    "box": boxes[i, k].tolist(),
                    "score": float(scores[i, k]),
                    "class_id": cid,
                    "class_name": class_names[cid],
                }
            )
        dets.sort(key=lambda d: -d["score"])
        out.append(dets)
    return out


class Predictor:
    """Fused normalize+forward+decode+NMS serving wrapper.

    Args:
      model: a flax detector module (models.registry.build_model).
      variables: {'params': ..., 'batch_stats': ...}.
      S, B, C: grid geometry (must match the model).
      score_threshold / nms_threshold: decode constants (reference
        visualization uses 0.1 / mAP eval uses 0.005 — utils/utils.py:405,
        eval.py:94).
      mesh: optional jax.sharding.Mesh for data-parallel serving — the
        request batch shards over the mesh's data axes, weights replicate,
        and XLA SPMD partitions the one compiled program (the serving
        analog of the reference's nn.DataParallel, train.py:80).  The
        batch size must divide the mesh's data-parallel extent.
    """

    def __init__(
        self,
        model,
        variables,
        S: int,
        B: int = 2,
        C: int = 20,
        score_threshold: float = 0.1,
        nms_threshold: float = 0.45,
        nms_impl: str = "auto",
        apply_fn=None,
        mesh=None,
    ):
        from yolo_v1_tpu.ops.pallas.nms_kernel import resolve_nms_impl

        nms_impl = resolve_nms_impl(nms_impl, mesh=mesh, K=S * S * B)
        self._mesh = mesh
        if mesh is not None:
            from yolo_v1_tpu.parallel.mesh import data_sharding, replicated

            self._in_sharding = data_sharding(mesh)
            variables = jax.device_put(variables, replicated(mesh))
        self.class_names: Sequence[str] = VOC_CLASSES
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        # apply_fn override: serve an int8-quantized state
        # (eval/quantize.quantize_state) or any custom forward.
        apply = apply_fn if apply_fn is not None else model.apply

        @jax.jit
        def _predict(variables, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            x = (x - mean) / std
            pred = apply(variables, x, train=False)
            boxes, scores, classes, valid = jax.vmap(
                partial(decode_grid, S=S, B=B, C=C, score_threshold=score_threshold)
            )(pred)
            if nms_impl == "fused":
                from yolo_v1_tpu.ops.pallas.fused_decode_nms import (
                    pallas_fused_decode_nms,
                )

                keep = pallas_fused_decode_nms(
                    pred.astype(jnp.float32), S=S, B=B, C=C,
                    score_threshold=score_threshold,
                    iou_threshold=nms_threshold,
                )
            elif nms_impl == "pallas":
                from yolo_v1_tpu.ops.pallas.nms_kernel import pallas_nms_keep_mask

                keep = pallas_nms_keep_mask(
                    boxes, scores, valid, iou_threshold=nms_threshold
                )
            else:
                keep = jax.vmap(
                    partial(nms_keep_mask, iou_threshold=nms_threshold)
                )(boxes, scores, valid)
            return jnp.clip(boxes, 0.0, 1.0), scores, classes, keep

        self._predict = _predict
        self._variables = variables

    def __call__(self, images_u8: np.ndarray) -> list[list[dict]]:
        """images_u8: [N, H, W, 3] uint8 RGB, square, already resized.

        Returns per-image lists of {'box': [x1,y1,x2,y2] normalized,
        'score': float, 'class_id': int, 'class_name': str}.
        """
        images = jnp.asarray(images_u8)
        if self._mesh is not None:
            images = jax.device_put(images, self._in_sharding)
        boxes, scores, classes, keep = jax.tree.map(
            np.asarray, self._predict(self._variables, images)
        )
        return detections_from_arrays(
            boxes, scores, classes, keep, self.class_names
        )
