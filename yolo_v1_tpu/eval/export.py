"""Portable serving artifacts via ``jax.export`` (StableHLO).

A deployment story the reference lacks entirely (its serving unit is a
Python loop over torch tensors, SURVEY.md §3.5): the fused serving
function — uint8 in, normalize + backbone + decode + NMS, one program
(eval/predictor.Predictor) — is traced once with the trained weights
baked in as constants, lowered to StableHLO for BOTH cpu and tpu, and
serialized to a single blob.  A serving host deserializes and calls it
with zero Python model code, any JAX version that honors the export
calling convention, and no checkpoint plumbing.

The NMS implementation is forced to the pure-XLA path: Pallas kernels
lower to backend-pinned custom calls, which would break the artifact's
portability (and the serving batch sizes here are below the measured
fused-kernel crossover anyway — ops/pallas/nms_kernel.resolve_nms_impl).

Artifact layout (under ``--save_dir``):
  serving.stablehlo   the serialized jax.export blob
  serving.json        geometry + thresholds + class names + provenance
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np


def export_serving(
    model,
    variables,
    *,
    S: int,
    B: int = 2,
    C: int = 20,
    batch: int = 32,
    image_size: int = 448,
    score_threshold: float = 0.1,
    nms_threshold: float = 0.45,
    class_names: Sequence[str] | None = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    apply_fn=None,
) -> tuple[bytes, dict]:
    """Serialize the fused serving function; returns (blob, metadata).

    The exported callable maps uint8 RGB ``[batch, image_size,
    image_size, 3]`` to ``(boxes [N,K,4] normalized xyxy, scores [N,K],
    classes [N,K], keep [N,K] bool)`` with K = S*S*B fixed detection
    slots — same program as ``Predictor._predict`` at ``nms_impl='xla'``
    (classes/keep exact, boxes/scores to numeric tolerance: the export
    pipeline fuses differently than the in-process jit; pinned by test)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from yolo_v1_tpu.data.voc import VOC_CLASSES
    from yolo_v1_tpu.eval.predictor import Predictor

    predictor = Predictor(
        model, variables, S=S, B=B, C=C,
        score_threshold=score_threshold, nms_threshold=nms_threshold,
        nms_impl="xla", apply_fn=apply_fn,
    )
    fn = jax.jit(lambda imgs: predictor._predict(variables, imgs))
    exp = jexport.export(fn, platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.uint8)
    )
    meta = {
        "S": S, "B": B, "C": C, "batch": batch, "image_size": image_size,
        "score_threshold": score_threshold, "nms_threshold": nms_threshold,
        "K": S * S * B,
        "input": f"uint8 RGB [{batch}, {image_size}, {image_size}, 3]",
        "outputs": ["boxes_xyxy_norm", "scores", "classes", "keep"],
        "class_names": list(class_names or VOC_CLASSES),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    return exp.serialize(), meta


def write_serving_artifact(save_dir: str, blob: bytes, meta: dict) -> str:
    path = os.path.join(save_dir, "serving.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    with open(os.path.join(save_dir, "serving.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_serving_artifact(save_dir: str):
    """Deserialize (callable, metadata) from a serving artifact directory.

    The callable is ``jax.export.Exported.call`` — runs under jit on
    whatever backend is active (one of the exported platforms)."""
    from jax import export as jexport

    with open(os.path.join(save_dir, "serving.stablehlo"), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(save_dir, "serving.json")) as f:
        meta = json.load(f)
    return exp.call, meta


class ArtifactPredictor:
    """Predictor-compatible wrapper over a serving artifact: uint8 batch in,
    per-image detection dicts out — so `cli serve --artifact <dir>` deploys
    an exported blob with zero model code or checkpoint plumbing.  Batch
    and image size are fixed by the artifact's metadata."""

    def __init__(self, save_dir: str):
        from yolo_v1_tpu.eval.predictor import detections_from_arrays

        self._call, self.meta = load_serving_artifact(save_dir)
        self._extract = detections_from_arrays
        self.batch = int(self.meta["batch"])
        self.image_size = int(self.meta["image_size"])
        self.class_names = self.meta["class_names"]

    def __call__(self, images_u8: np.ndarray) -> list[list[dict]]:
        if images_u8.shape != (self.batch, self.image_size, self.image_size, 3):
            raise ValueError(
                f"artifact expects {self.meta['input']}, got "
                f"{images_u8.shape} — exported programs have ONE shape"
            )
        boxes, scores, classes, keep = (
            np.asarray(a) for a in self._call(images_u8)
        )
        return self._extract(boxes, scores, classes, keep, self.class_names)
