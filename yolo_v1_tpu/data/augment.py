"""Training-time augmentation: numpy/cv2, deterministic per-sample keys.

Reproduces the reference's imgaug policy
(`/root/reference/utils/YOLODataLoader.py:28-79`) family-for-family:

* 25%-gated "some of 1..3" pixel ops (:34-64): dropout, sharpen, one of
  {gaussian, average, bilateral, median} blur, elementwise add, additive
  gaussian noise, jpeg compression, multiply, elementwise multiply,
  elementwise replace (salt&pepper), HSV saturation/value shift;
* horizontal flip p=.5, vertical flip p=.125 (:66-67);
* 50%-gated affine: scale 0.8-1.2 per axis, translate ±10%, rotate ±5°
  (:69-76), with box corners transformed and out-of-image boxes
  removed/clipped (:172).

Divergences (documented; bit-parity with imgaug's RNG is impossible anyway —
SURVEY.md §7 'Augmentation parity'):

* ops are applied to the 448-resized image, with boxes in the same 448
  coordinate frame — the reference augments the original-size image while
  transforming boxes in 448-space (YOLODataLoader.py:169-172), which skews
  rotations when the aspect ratio isn't square;
* randomness comes from a per-sample ``np.random.Generator`` seeded with
  (seed, epoch, index), so any sample is reproducible in isolation — the
  reference seeds imgaug's global RNG once (YOLODataLoader.py:10);
* no ``- 1`` center shift when converting boxes back
  (YOLODataLoader.py:145-146 subtracts one pixel from every center).
"""

from __future__ import annotations

from dataclasses import dataclass

import cv2
import numpy as np


@dataclass(frozen=True)
class AugmentConfig:
    pixel_prob: float = 0.25  # YOLODataLoader.py:28
    flip_lr_prob: float = 0.5  # :66
    flip_ud_prob: float = 0.125  # :67
    affine_prob: float = 0.5  # :29
    scale_range: tuple[float, float] = (0.8, 1.2)  # :72
    translate_range: tuple[float, float] = (-0.1, 0.1)  # :73
    rotate_range: tuple[float, float] = (-5.0, 5.0)  # :74


# --- pixel ops (each takes uint8 HWC BGR-or-RGB image, returns same) ---


def _dropout(img, rng):
    p = rng.choice([0.05, 0.2])  # :36
    mask = rng.random(img.shape[:2]) < p
    out = img.copy()
    out[mask] = 0
    return out


def _sharpen(img, rng):
    alpha = rng.uniform(0.1, 0.8)  # :37
    blur = cv2.GaussianBlur(img, (0, 0), 1.0)
    out = cv2.addWeighted(img, 1 + alpha, blur, -alpha, 0)
    return out


def _blur(img, rng):
    kind = rng.integers(0, 4)  # one-of blur family :39-44
    if kind == 0:
        return cv2.GaussianBlur(img, (0, 0), rng.uniform(2.0, 3.5))
    if kind == 1:
        k = int(rng.integers(2, 6))
        return cv2.blur(img, (k, k))
    if kind == 2:
        d = int(rng.integers(7, 13))
        sc = rng.uniform(10, 250)
        ss = rng.uniform(10, 250)
        return cv2.bilateralFilter(img, d, sc, ss)
    k = int(rng.integers(1, 4)) * 2 + 1  # odd 3..7
    return cv2.medianBlur(img, k)


def _add_elementwise(img, rng):
    noise = rng.integers(-50, 51, img.shape, dtype=np.int16)  # :47
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def _gauss_noise(img, rng):
    sigma = rng.uniform(0, 0.1 * 255)  # :48
    noise = rng.normal(0, sigma, img.shape)
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def _jpeg(img, rng):
    quality = int(rng.integers(5, 21))  # compression 80-95 => quality 5-20 :49
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, quality])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR) if ok else img


def _multiply(img, rng):
    m = rng.uniform(0.5, 1.5)  # :51
    return np.clip(img.astype(np.float32) * m, 0, 255).astype(np.uint8)


def _multiply_elementwise(img, rng):
    m = rng.uniform(0.5, 1.5, img.shape).astype(np.float32)  # :52
    return np.clip(img.astype(np.float32) * m, 0, 255).astype(np.uint8)


def _replace_elementwise(img, rng):
    mask = rng.random(img.shape[:2]) < 0.05  # :53
    out = img.copy()
    out[mask] = rng.choice([0, 255], size=int(mask.sum()))[:, None]
    return out


def _hsv_shift(img, rng):
    channel = int(rng.integers(1, 3))  # S or V :56-61
    delta = int(rng.integers(-10, 51))
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int16)
    hsv[:, :, channel] = np.clip(hsv[:, :, channel] + delta, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


_PIXEL_OPS = (
    _dropout, _sharpen, _blur, _add_elementwise, _gauss_noise,
    _jpeg, _multiply, _multiply_elementwise, _replace_elementwise, _hsv_shift,
)


def _affine_matrix(size: int, rng, cfg: AugmentConfig) -> np.ndarray:
    sx = rng.uniform(*cfg.scale_range)
    sy = rng.uniform(*cfg.scale_range)
    tx = rng.uniform(*cfg.translate_range) * size
    ty = rng.uniform(*cfg.translate_range) * size
    theta = np.deg2rad(rng.uniform(*cfg.rotate_range))
    c, s = np.cos(theta), np.sin(theta)
    center = size / 2.0
    # M = T(center + t) @ R @ S @ T(-center)
    rs = np.array([[c * sx, -s * sy], [s * sx, c * sy]])
    offset = np.array([center + tx, center + ty]) - rs @ np.array([center, center])
    return np.concatenate([rs, offset[:, None]], axis=1)


def _transform_boxes(boxes_xyxy: np.ndarray, M: np.ndarray) -> np.ndarray:
    """Axis-aligned hull of the 4 transformed corners (imgaug bbox rule)."""
    if len(boxes_xyxy) == 0:
        return boxes_xyxy
    x1, y1, x2, y2 = boxes_xyxy.T
    corners = np.stack(
        [
            np.stack([x1, y1], 1), np.stack([x2, y1], 1),
            np.stack([x2, y2], 1), np.stack([x1, y2], 1),
        ],
        axis=1,
    )  # [n, 4, 2]
    warped = corners @ M[:, :2].T + M[:, 2]
    return np.concatenate(
        [warped.min(axis=1), warped.max(axis=1)], axis=1
    )


def augment_sample(
    image: np.ndarray,
    boxes_cxcywh: np.ndarray,
    labels: np.ndarray,
    rng: np.random.Generator,
    cfg: AugmentConfig = AugmentConfig(),
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Augment one (uint8 RGB square image, normalized cxcywh boxes, labels).

    Returns the augmented image and surviving normalized boxes/labels
    (out-of-image boxes removed, partially-outside boxes clipped —
    YOLODataLoader.py:172).
    """
    size = image.shape[0]
    assert image.shape[0] == image.shape[1], "augment expects square images"

    # pixel family (order randomized like iaa.SomeOf(random_order=True))
    if rng.random() < cfg.pixel_prob:
        n_ops = int(rng.integers(1, 4))
        ops = rng.choice(len(_PIXEL_OPS), size=n_ops, replace=False)
        for op_idx in ops:
            image = _PIXEL_OPS[op_idx](image, rng)

    xyxy = np.concatenate(
        [
            (boxes_cxcywh[:, :2] - 0.5 * boxes_cxcywh[:, 2:]) * size,
            (boxes_cxcywh[:, :2] + 0.5 * boxes_cxcywh[:, 2:]) * size,
        ],
        axis=1,
    ) if len(boxes_cxcywh) else np.zeros((0, 4), np.float32)

    if rng.random() < cfg.flip_lr_prob:
        image = image[:, ::-1]
        if len(xyxy):
            xyxy = np.stack(
                [size - xyxy[:, 2], xyxy[:, 1], size - xyxy[:, 0], xyxy[:, 3]], 1
            )
    if rng.random() < cfg.flip_ud_prob:
        image = image[::-1]
        if len(xyxy):
            xyxy = np.stack(
                [xyxy[:, 0], size - xyxy[:, 3], xyxy[:, 2], size - xyxy[:, 1]], 1
            )

    if rng.random() < cfg.affine_prob:
        M = _affine_matrix(size, rng, cfg)
        image = cv2.warpAffine(image, M, (size, size))
        xyxy = _transform_boxes(xyxy, M)

    image = np.ascontiguousarray(image)
    if len(xyxy) == 0:
        return image, np.zeros((0, 4), np.float32), labels[:0]

    # Remove boxes fully outside; clip the rest (YOLODataLoader.py:172).
    inside = (
        (xyxy[:, 2] > 0) & (xyxy[:, 3] > 0)
        & (xyxy[:, 0] < size) & (xyxy[:, 1] < size)
    )
    xyxy = np.clip(xyxy[inside], 0, size)
    labels = labels[inside]
    nonempty = (xyxy[:, 2] - xyxy[:, 0] > 1) & (xyxy[:, 3] - xyxy[:, 1] > 1)
    xyxy, labels = xyxy[nonempty], labels[nonempty]

    out = np.concatenate(
        [
            (xyxy[:, :2] + xyxy[:, 2:]) / 2.0 / size,
            (xyxy[:, 2:] - xyxy[:, :2]) / size,
        ],
        axis=1,
    ).astype(np.float32)
    return image, out, labels
