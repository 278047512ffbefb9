"""Prediction visualization — parity with the reference debug renderer
(`/root/reference/utils/utils.py:452-479` draw_debug_rect and eval.py).

Headless-friendly: draws boxes/class/conf onto images and writes files
instead of the reference's blocking ``cv2.imshow`` (:478-479).
"""

from __future__ import annotations

import os
from typing import Sequence

import cv2
import numpy as np

from yolo_v1_tpu.data.voc import VOC_CLASSES

# The reference's per-class palette (utils/utils.py:193-213).
_COLORS = [
    (0, 0, 0), (128, 0, 0), (0, 128, 0), (128, 128, 0), (0, 0, 128),
    (128, 0, 128), (0, 128, 128), (128, 128, 128), (64, 0, 0), (192, 0, 0),
    (64, 128, 0), (192, 128, 0), (64, 0, 128), (192, 0, 128), (64, 128, 128),
    (192, 128, 128), (0, 64, 0), (128, 64, 0), (0, 192, 0), (128, 192, 0),
]


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    classes: np.ndarray,
    scores: np.ndarray,
    class_names: Sequence[str] = VOC_CLASSES,
) -> np.ndarray:
    """Draw normalized corner boxes onto a uint8 RGB image (returns a copy)."""
    img = image.copy()
    h, w = img.shape[:2]
    for box, cls, score in zip(boxes, classes, scores):
        x1, y1, x2, y2 = (
            int(box[0] * w), int(box[1] * h), int(box[2] * w), int(box[3] * h)
        )
        color = _COLORS[int(cls) % len(_COLORS)]
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        cv2.putText(
            img, f"{class_names[int(cls)]} {float(score):.2f}", (x1, y1 + 10),
            cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1,
        )
    return img


def save_visualization(path: str, image_rgb: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR))
