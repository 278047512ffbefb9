"""tools/voc_preflight.py against a synthetic VOCdevkit fixture: the
real-VOC launch validator must pass on a well-formed devkit (layout,
conversion cardinalities, XML->label round-trip, train + little-eval
smoke) and fail loudly on a broken one."""

import importlib.util
import json
import os
import xml.etree.ElementTree as ET

import cv2
import numpy as np
import pytest


def _load_preflight():
    spec = importlib.util.spec_from_file_location(
        "voc_preflight",
        os.path.join(os.path.dirname(__file__), "..", "tools", "voc_preflight.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_devkit(root, n_train=8, n_test=4, image_size=112, seed=0):
    """Minimal VOCdevkit/VOC2007 tree with XML annotations (the real
    dataset's on-disk format, which cli prepare-data consumes)."""
    from yolo_v1_tpu.data.voc import VOC_CLASSES

    g = np.random.default_rng(seed)
    voc = root / "VOCdevkit" / "VOC2007"
    for d in ("Annotations", "JPEGImages", os.path.join("ImageSets", "Main")):
        (voc / d).mkdir(parents=True, exist_ok=True)
    ids = {"train": [], "test": []}
    for split, n in (("train", n_train), ("test", n_test)):
        for i in range(n):
            name = f"{split}{i:03d}"
            img = g.integers(0, 60, (image_size, image_size, 3), np.uint8)
            ann = ET.Element("annotation")
            size = ET.SubElement(ann, "size")
            ET.SubElement(size, "width").text = str(image_size)
            ET.SubElement(size, "height").text = str(image_size)
            ET.SubElement(size, "depth").text = "3"
            for q in g.permutation(4)[: int(g.integers(1, 3))]:
                cls = VOC_CLASSES[int(g.integers(0, 20))]
                w, h = g.uniform(0.2, 0.38, 2)
                cx = (q % 2) * 0.5 + 0.25
                cy = (q // 2) * 0.5 + 0.25
                x1 = max(1, int((cx - w / 2) * image_size))
                y1 = max(1, int((cy - h / 2) * image_size))
                x2 = min(image_size, int((cx + w / 2) * image_size))
                y2 = min(image_size, int((cy + h / 2) * image_size))
                cv2.rectangle(
                    img, (x1, y1), (x2, y2),
                    tuple(int(c) for c in g.integers(120, 255, 3)), -1,
                )
                obj = ET.SubElement(ann, "object")
                ET.SubElement(obj, "name").text = cls
                ET.SubElement(obj, "difficult").text = "0"
                bb = ET.SubElement(obj, "bndbox")
                ET.SubElement(bb, "xmin").text = str(x1)
                ET.SubElement(bb, "ymin").text = str(y1)
                ET.SubElement(bb, "xmax").text = str(x2)
                ET.SubElement(bb, "ymax").text = str(y2)
            cv2.imwrite(str(voc / "JPEGImages" / f"{name}.jpg"), img)
            ET.ElementTree(ann).write(str(voc / "Annotations" / f"{name}.xml"))
            ids[split].append(name)
    for split in ("train", "test"):
        (voc / "ImageSets" / "Main" / f"{split}.txt").write_text(
            "\n".join(ids[split]) + "\n"
        )
    return ids


@pytest.mark.slow
def test_preflight_passes_on_synthetic_devkit(tmp_path):
    make_devkit(tmp_path, n_train=8, n_test=4)
    mod = _load_preflight()
    out_dir = str(tmp_path / "datasets")
    rc = mod.main([
        "--devkit_base", str(tmp_path),
        "--out_dir", out_dir,
        "--expect", json.dumps({"2007_train.txt": 8, "2007_test.txt": 4}),
        "--train_list", os.path.join(out_dir, "2007_train.txt"),
        "--test_list", os.path.join(out_dir, "2007_test.txt"),
        "--backbone", "tiny", "--image_size", "112", "--smoke_steps", "10",
    ])
    assert rc == 0
    # The converter produced the labels the trainer/eval consume.
    assert os.path.exists(
        str(tmp_path / "VOCdevkit" / "VOC2007" / "labels" / "train000.txt")
    )


def test_preflight_fails_on_missing_images(tmp_path):
    make_devkit(tmp_path, n_train=4, n_test=2)
    os.remove(
        str(tmp_path / "VOCdevkit" / "VOC2007" / "JPEGImages" / "train001.jpg")
    )
    mod = _load_preflight()
    rc = mod.main([
        "--devkit_base", str(tmp_path),
        "--out_dir", str(tmp_path / "datasets"),
        "--expect", json.dumps({"2007_train.txt": 4}),
        "--smoke", "false",
    ])
    assert rc == 1


def test_preflight_fails_on_wrong_cardinality(tmp_path):
    make_devkit(tmp_path, n_train=4, n_test=2)
    mod = _load_preflight()
    rc = mod.main([
        "--devkit_base", str(tmp_path),
        "--out_dir", str(tmp_path / "datasets"),
        # Real-VOC expectations against a 4-image fixture must fail.
        "--smoke", "false",
    ])
    assert rc == 1
