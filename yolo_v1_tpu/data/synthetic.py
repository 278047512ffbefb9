"""Synthetic VOC-style dataset generator for hardware training demos.

The reference's headline outcome is a multi-day VOC training run
(`/root/reference/train.py:144-209`, README.md:8-12).  This build box has
no dataset egress, so end-to-end training demonstrations run on a
generated stand-in that keeps every contract of the real pipeline:

* on-disk layout identical to the converter output
  (`testCodes/voc_label.py:48-59`): ``JPEGImages/*.jpg`` +
  ``labels/*.txt`` with normalized ``cls cx cy w h`` rows + absolute-path
  list files — so `cli train`/`map`/`visualize` run unchanged;
* 20 classes whose identity IS learnable from pixels: each class maps to a
  unique (hue, shape) pair, stable under the augmentation family (HSV
  saturation/value shifts, flips, affine, blur, noise — none disturb hue
  order or shape class);
* variable object count/size/position, overlapping clutter, low-saturation
  distractor shapes and textured backgrounds so confidence and class heads
  both have real work to do.

This is a data source, not a benchmark: BASELINE.md's VOC numbers remain
the north star whenever real VOC can be mounted.
"""

from __future__ import annotations

import os

import numpy as np

N_SHAPES = 4  # rectangle, ellipse, triangle, diamond
N_HUES = 5


def class_style(cls: int) -> tuple[int, int]:
    """class id -> (shape index, OpenCV hue in [0, 180))."""
    shape = cls % N_SHAPES
    hue = (cls // N_SHAPES) * (180 // N_HUES) + 8
    return shape, hue


def _draw_shape(img, shape: int, x1: int, y1: int, x2: int, y2: int, color):
    import cv2

    color = tuple(int(c) for c in color)
    if shape == 0:  # rectangle
        cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
    elif shape == 1:  # ellipse
        cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
        cv2.ellipse(
            img, (cx, cy), ((x2 - x1) // 2, (y2 - y1) // 2), 0, 0, 360,
            color, -1,
        )
    elif shape == 2:  # triangle (apex up)
        pts = np.array(
            [[(x1 + x2) // 2, y1], [x1, y2], [x2, y2]], np.int32
        )
        cv2.fillPoly(img, [pts], color)
    else:  # diamond
        cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
        pts = np.array([[cx, y1], [x2, cy], [cx, y2], [x1, cy]], np.int32)
        cv2.fillPoly(img, [pts], color)


def _hsv_color(hue: int, sat: int, val: int) -> np.ndarray:
    import cv2

    hsv = np.array([[[hue, sat, val]]], np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)[0, 0]


def _iou(a, b) -> float:
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / union if union > 0 else 0.0


def generate_image(
    rng: np.random.Generator,
    image_size: int = 448,
    n_classes: int = 20,
    max_objects: int = 4,
    hard: bool = False,
) -> tuple[np.ndarray, list[tuple[int, float, float, float, float]]]:
    """One RGB uint8 image + [(cls, cx, cy, w, h) normalized] ground truth.

    ``hard=True`` is the benchmark tier built after the round-2 finding
    that the easy tier saturates (mAP > 0.96 by epoch ~10, so the
    reference's 0.585 full-eval gate, train.py:137, stopped gating and
    recipe regressions became invisible above ~0.99 — VERDICT r2 weak #5).
    Hardness levers, each targeting a known YOLOv1 weakness (the paper's
    own error analysis: small objects, groups, localization):

    * small objects: w, h down to 0.045 (a 20px object covers <1% of a
      448px image; S=7 cells are 64px, so several objects share cells);
    * occlusions: objects may overlap up to IoU 0.45 and later draws
      paint over earlier ones;
    * confusable classes: per-object hue jitter +-9 against a 36-unit
      class hue spacing, saturation down to 110 — hue neighbors collide
      under the augmentation family's own HSV shifts;
    * distractor density: up to 10 mid/high-saturation distractors (the
      easy tier's are low-saturation only);
    * dense scenes: up to ``max(16, max_objects)`` objects per image;
    * degradations: global blur (sigma up to 1.6) and brightness/contrast
      swings applied AFTER drawing, so edges and hue both degrade.
    """
    import cv2

    s = image_size
    # Textured background: smooth low-frequency gradient + noise.
    base = rng.integers(30, 120)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
    grad = (
        base
        + rng.uniform(-40, 40) * xx
        + rng.uniform(-40, 40) * yy
    )
    img = np.clip(
        grad[..., None] + rng.normal(0, 12, (s, s, 3)), 0, 255
    ).astype(np.uint8)

    # Distractor shapes (no class identity).  Easy: few, low-saturation.
    # Hard: dense, and saturated enough to resemble real objects.
    n_distract = int(rng.integers(0, 11 if hard else 4))
    max_sat = 140 if hard else 45
    for _ in range(n_distract):
        w, h = rng.uniform(0.05 if hard else 0.08, 0.3, 2)
        cx, cy = rng.uniform(0.1, 0.9, 2)
        x1, y1 = int((cx - w / 2) * s), int((cy - h / 2) * s)
        x2, y2 = int((cx + w / 2) * s), int((cy + h / 2) * s)
        color = _hsv_color(int(rng.integers(0, 180)),
                           int(rng.integers(0, max_sat)),
                           int(rng.integers(60, 200)))
        _draw_shape(img, int(rng.integers(0, N_SHAPES)),
                    max(x1, 0), max(y1, 0), min(x2, s - 1), min(y2, s - 1),
                    color)

    boxes: list[tuple[int, float, float, float, float]] = []
    placed: list[tuple[float, float, float, float]] = []
    if hard:
        max_objects = max(16, max_objects)
        lo_wh, hi_wh = 0.045, 0.38
        iou_cap = 0.45
        n_obj = int(rng.integers(2, max_objects + 1))
    else:
        lo_wh, hi_wh = 0.14, 0.45
        iou_cap = 0.15
        n_obj = int(rng.integers(1, max_objects + 1))
    for _ in range(n_obj):
        for _attempt in range(10):
            # Log-uniform sizes in hard mode: half the draws land below
            # ~0.13, keeping the small-object regime populated.
            if hard:
                w = float(np.exp(rng.uniform(np.log(lo_wh), np.log(hi_wh))))
                h = float(
                    np.clip(w * rng.uniform(0.6, 1.7), lo_wh, hi_wh)
                )
            else:
                w = float(rng.uniform(lo_wh, hi_wh))
                h = float(rng.uniform(lo_wh, hi_wh))
            cx = float(rng.uniform(w / 2 + 0.02, 1 - w / 2 - 0.02))
            cy = float(rng.uniform(h / 2 + 0.02, 1 - h / 2 - 0.02))
            cand = (cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)
            if all(_iou(cand, p) < iou_cap for p in placed):
                break
        else:
            continue
        placed.append(cand)
        cls = int(rng.integers(0, n_classes))
        shape, hue = class_style(cls)
        if hard:
            hue = int((hue + rng.integers(-9, 10)) % 180)
            sat = int(rng.integers(110, 256))
            val = int(rng.integers(110, 256))
        else:
            sat = int(rng.integers(170, 256))
            val = int(rng.integers(150, 256))
        color = _hsv_color(hue, sat, val)
        x1, y1 = int(cand[0] * s), int(cand[1] * s)
        x2, y2 = int(cand[2] * s), int(cand[3] * s)
        _draw_shape(img, shape, x1, y1, x2, y2, color)
        # Darker border of the same hue: a second learnable cue that
        # survives blur better than the fill edge alone.
        edge = _hsv_color(hue, 255, max(60, val - 90))
        if shape == 0:
            cv2.rectangle(img, (x1, y1), (x2, y2), tuple(int(c) for c in edge), 2)
        boxes.append((cls, cx, cy, w, h))

    if hard:
        # Global degradations after drawing: blur softens small-object
        # edges; brightness/contrast swings stress the normalized input.
        sigma = float(rng.uniform(0.0, 1.6))
        if sigma > 0.2:
            img = cv2.GaussianBlur(img, (0, 0), sigma)
        alpha = float(rng.uniform(0.7, 1.3))
        beta = float(rng.uniform(-30, 30))
        img = np.clip(img.astype(np.float32) * alpha + beta, 0, 255).astype(
            np.uint8
        )
    return img, boxes


def generate_dataset(
    out_dir: str,
    n_train: int = 4000,
    n_test: int = 800,
    image_size: int = 448,
    n_classes: int = 20,
    seed: int = 0,
    jpeg_quality: int = 92,
    hard: bool = False,
) -> dict[str, int]:
    """Write a full synthetic VOC tree; returns {list_file: count}.

    Train and test draw from the same distribution with disjoint RNG
    streams (the synthetic analog of the VOC trainval/test split).
    ``hard=True`` generates the non-saturating benchmark tier (see
    generate_image); its RNG stream ids are distinct from the easy tier's,
    so the two tiers never share images even at the same seed.
    """
    import cv2

    img_dir = os.path.join(out_dir, "JPEGImages")
    lab_dir = os.path.join(out_dir, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    counts = {}
    base_stream = 2 if hard else 0
    for split, n, stream in (
        ("train", n_train, base_stream), ("test", n_test, base_stream + 1)
    ):
        lines = []
        for i in range(n):
            rng = np.random.default_rng(
                np.random.SeedSequence([seed, stream, i])
            )
            img, boxes = generate_image(rng, image_size, n_classes, hard=hard)
            name = f"synth_{split}_{i:05d}"
            path = os.path.join(img_dir, f"{name}.jpg")
            cv2.imwrite(
                path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality],
            )
            with open(os.path.join(lab_dir, f"{name}.txt"), "w") as f:
                for cls, cx, cy, w, h in boxes:
                    f.write(f"{cls} {cx} {cy} {w} {h}\n")
            lines.append(os.path.abspath(path))
        list_path = os.path.join(out_dir, f"{split}.txt")
        with open(list_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        counts[f"{split}.txt"] = n
    return counts
