"""yolo_v1_tpu — a TPU-native (JAX/XLA/Pallas/pjit) YOLOv1 framework.

A from-scratch rebuild of the capabilities of haoran1062/YOLO_V1 (PyTorch,
single GPU) as an idiomatic TPU stack: functional models (flax.linen, NHWC,
bfloat16), fully vectorized loss/decode/NMS (no Python hot loops), sharded
data-parallel training over a ``jax.sharding.Mesh``, Orbax checkpointing,
and a batched on-device mAP evaluator.
"""

__version__ = "0.1.0"

from yolo_v1_tpu.core import ap, boxes, grid, nms  # noqa: F401
from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig, yolo_v1_loss  # noqa: F401
from yolo_v1_tpu.models.registry import available_models, build_model  # noqa: F401
