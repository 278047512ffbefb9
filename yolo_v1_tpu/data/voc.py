"""Pascal VOC dataset plumbing: labels, list files, GT index, XML converter.

Capability parity:

* ``VOC_CLASSES`` — the 20-class tuple (`/root/reference/utils/utils.py:187-192`).
* ``convert_voc_annotations`` — offline VOCdevkit XML -> per-image
  ``labels/*.txt`` converter with ``cls cx cy w h`` normalized rows and
  per-(year, set) image list files (`testCodes/voc_label.py:13-59`),
  including the reference's center convention ``(xmin+xmax)/2 - 1`` before
  normalizing (:16-17) and its inclusion of difficult objects (the
  ``int(difficult)==1`` filter is commented out at :38).
* ``parse_label_file`` / ``load_gt_boxes`` — label txt parsing and the
  448-pixel-space GT boxes used by evaluation
  (`utils/utils.py:326-345`: corner = int((c ± s/2) * 448)).
* ``prep_test_data`` — {(image_id, class): [boxes]} GT index
  (`utils/utils.py:356-387`).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from collections import defaultdict
from typing import Sequence

import numpy as np

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat",
    "bottle", "bus", "car", "cat", "chair",
    "cow", "diningtable", "dog", "horse",
    "motorbike", "person", "pottedplant",
    "sheep", "sofa", "train", "tvmonitor",
)

DEFAULT_SETS = (
    ("2012", "train"), ("2012", "val"),
    ("2007", "train"), ("2007", "val"), ("2007", "test"),
)


def label_path_for_image(img_path: str) -> str:
    """JPEGImages/x.jpg -> labels/x.txt (reference utils/utils.py:330)."""
    return img_path.replace("JPEGImages", "labels").replace("jpg", "txt")


def image_id_of(img_path: str) -> str:
    """Basename without extension (reference utils/utils.py:377)."""
    return os.path.basename(img_path).split(".")[0]


def parse_label_file(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read 'cls cx cy w h' rows -> (boxes [n,4] float32, labels [n] int32)."""
    boxes, labels = [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) != 5:
                continue
            labels.append(int(parts[0]))
            boxes.append([float(v) for v in parts[1:]])
    return (
        np.asarray(boxes, np.float32).reshape(-1, 4),
        np.asarray(labels, np.int32),
    )


def load_gt_boxes(img_path: str, img_size: tuple[int, int] = (448, 448)) -> list:
    """[[label, x0, y0, x1, y1]] in pixel space (utils/utils.py:326-345:
    truncating-int corners at cx ± w/2 scaled by the eval image size)."""
    boxes, labels = parse_label_file(label_path_for_image(img_path))
    out = []
    for (cx, cy, w, h), lab in zip(boxes, labels):
        out.append(
            [
                int(lab),
                int((cx - 0.5 * w) * img_size[0]),
                int((cy - 0.5 * h) * img_size[1]),
                int((cx + 0.5 * w) * img_size[0]),
                int((cy + 0.5 * h) * img_size[1]),
            ]
        )
    return out


def read_list_file(path: str, limit: int | None = None) -> list[str]:
    with open(path) as f:
        files = [line.strip().split()[0] for line in f if line.strip()]
    return files[:limit] if limit else files


def prep_test_data(
    list_file: str,
    little_test: int | None = None,
    class_names: Sequence[str] = VOC_CLASSES,
) -> dict:
    """GT index {(image_id, class_name): [[x0,y0,x1,y1], ...]}
    (reference utils/utils.py:356-387)."""
    target: dict = defaultdict(list)
    for img_path in read_list_file(list_file, little_test):
        image_id = image_id_of(img_path)
        for label, *corners in load_gt_boxes(img_path):
            target[(image_id, class_names[label])].append(corners)
    return dict(target)


def convert_box_to_yolo(
    size: tuple[float, float], box: tuple[float, float, float, float]
) -> tuple[float, float, float, float]:
    """(xmin, xmax, ymin, ymax) in pixels -> normalized (cx, cy, w, h) with
    the reference's off-by-one center shift (voc_label.py:13-24)."""
    w_img, h_img = size
    x = ((box[0] + box[1]) / 2.0 - 1) / w_img
    y = ((box[2] + box[3]) / 2.0 - 1) / h_img
    w = (box[1] - box[0]) / w_img
    h = (box[3] - box[2]) / h_img
    return x, y, w, h


def convert_voc_annotations(
    devkit_base: str,
    out_dir: str = "datasets",
    sets: Sequence[tuple[str, str]] = DEFAULT_SETS,
    class_names: Sequence[str] = VOC_CLASSES,
    include_difficult: bool = True,
    make_train_aggregates: bool = True,
) -> dict[str, int]:
    """Offline converter (reference testCodes/voc_label.py:26-59).

    Parses ``<devkit_base>/VOCdevkit/VOC<year>/Annotations/*.xml`` into
    ``labels/*.txt`` next to JPEGImages, writes ``<out_dir>/<year>_<set>.txt``
    absolute-path image lists, and (optionally) concatenates the reference's
    ``train.txt`` / ``train.all.txt`` aggregates (:58-59).

    ``include_difficult=True`` matches the reference (its difficult filter is
    commented out, voc_label.py:38).
    Returns {list_file_name: image_count}.
    """
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {}
    for year, image_set in sets:
        voc_root = os.path.join(devkit_base, "VOCdevkit", f"VOC{year}")
        ids_file = os.path.join(voc_root, "ImageSets", "Main", f"{image_set}.txt")
        if not os.path.exists(ids_file):
            # Partial devkits (e.g. only VOC2007) are common; skip rather
            # than crash (the reference crashes, voc_label.py:51).
            print(f"skipping {year}/{image_set}: no {ids_file}")
            continue
        labels_dir = os.path.join(voc_root, "labels")
        os.makedirs(labels_dir, exist_ok=True)
        image_ids = open(ids_file).read().strip().split()
        list_name = f"{year}_{image_set}.txt"
        with open(os.path.join(out_dir, list_name), "w") as list_file:
            for image_id in image_ids:
                img_path = os.path.join(voc_root, "JPEGImages", f"{image_id}.jpg")
                list_file.write(img_path + "\n")
                _convert_one_annotation(
                    voc_root, image_id, class_names, include_difficult
                )
        counts[list_name] = len(image_ids)

    if make_train_aggregates:
        _concat(out_dir, "train.txt",
                ["2007_train.txt", "2007_val.txt", "2012_train.txt", "2012_val.txt"])
        _concat(out_dir, "train.all.txt",
                ["2007_train.txt", "2007_val.txt", "2007_test.txt",
                 "2012_train.txt", "2012_val.txt"])
    return counts


def _convert_one_annotation(voc_root, image_id, class_names, include_difficult):
    xml_path = os.path.join(voc_root, "Annotations", f"{image_id}.xml")
    root = ET.parse(xml_path).getroot()
    size = root.find("size")
    w = int(size.find("width").text)
    h = int(size.find("height").text)
    lines = []
    for obj in root.iter("object"):
        cls = obj.find("name").text
        if cls not in class_names:
            continue
        if not include_difficult and int(obj.find("difficult").text) == 1:
            continue
        bb = obj.find("bndbox")
        box = (
            float(bb.find("xmin").text), float(bb.find("xmax").text),
            float(bb.find("ymin").text), float(bb.find("ymax").text),
        )
        yolo = convert_box_to_yolo((w, h), box)
        lines.append(
            f"{class_names.index(cls)} " + " ".join(str(v) for v in yolo)
        )
    with open(os.path.join(voc_root, "labels", f"{image_id}.txt"), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def _concat(out_dir: str, dest: str, sources: list[str]) -> None:
    with open(os.path.join(out_dir, dest), "w") as out:
        for src in sources:
            path = os.path.join(out_dir, src)
            if os.path.exists(path):
                out.write(open(path).read())
